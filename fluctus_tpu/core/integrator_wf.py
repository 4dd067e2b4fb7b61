"""Wavefront (throughput) integrator — the TPU-native re-design of the
reference's Aila-style queue pipeline (wf_reset / wf_raygen / wf_logic /
wf_mat_* / wf_extrays / wf_shadowrays, driven by Tracer::update,
tracer.cpp:250-294).

Design translation (SURVEY §7):
  * The fixed-size path pool (NUM_TASKS paths in flight, decoupled from the
    pixel count by the pixel-index ring, wf_raygen.cl:25 +
    clcontext.cpp:917-927) is an SoA pytree of [num_tasks] arrays.
  * Queues + atomic counters become boolean masks; queue *lengths* are mask
    popcounts returned as outputs (the counter-readback analogue).
  * The atomic float image splat (utils.cl:269-305) becomes a deterministic
    ``segment_sum`` over pixel indices.
  * Material binning (wf_logic.cl:337-342) is unnecessary: shading runs as a
    masked superkernel over the lobes present in the scene.
  * One call = one wavefront segment, fully fused and loop-free.

Segment order is rotated relative to the reference (trace first, then
logic/shade) so the MXU winner-resolve kernel's hit attributes and baked
material parameters are consumed in the same dispatch — the hit record
never round-trips through the pool. Dataflow is identical to the
reference's logic -> raygen -> material -> extension -> shadow chain; only
the iteration boundary moves.

MIS weights, the light-pick probability split (env vs area,
wf_logic.cl:249-251), RR placement (wf_logic.cl:62-74 with the T /=
contProb compensation), the 0.995 shadow-ray shortening for area lights
(wf_logic.cl:308) and the CHECK_SPP splat cap (wf_logic.cl:76-84,177-189)
follow the reference — except that the cap here is EXACT: splatting lanes
are ranked per pixel within the segment and clipped to the pixel's
remaining budget, where the reference's racy double-check can overshoot
by the number of same-pixel terminations in flight.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import bxdf_types as bx
from ..bsdf import bxdf_eval, bxdf_pdf, bxdf_sample, resolve_material
from ..envmap import env_radiance_and_pdf, env_sample
from ..geom import MIN_PATH_LENGTH, RenderConfig, RenderParams
from ..rng import rand
from ..sampling import pdf_area_to_solid_angle, sample_area_light
from ..vec import Vec3, dot, is_zero, length, luminance, where as vwhere
from .camera import generate_camera_rays
from .integrator_mk import FeatureFilm, Film
from .trace import (DeviceScene, tangent_space_normal, trace_extension,
                    trace_extension_raw, trace_pair, trace_shadow)
from .. import flags


class WfPool(NamedTuple):
    """Path pool SoA — GPUTaskState (geom.h:222-259) as [num_tasks] arrays.
    Hit records are NOT stored: the segment traces and shades in one pass."""
    orig: Vec3
    dir: Vec3
    shadow_orig: Vec3
    shadow_dir: Vec3
    T: Vec3
    Ei: Vec3
    last_bsdf: Vec3
    last_emission: Vec3
    last_T: Vec3
    last_pdf_w: jnp.ndarray
    path_len: jnp.ndarray       # int32; -1 = freshly reset (pre-first-trace)
    seed: jnp.ndarray
    last_specular: jnp.ndarray
    shadow_blocked: jnp.ndarray
    shadow_pending: jnp.ndarray
    pixel_index: jnp.ndarray
    last_pdf_direct: jnp.ndarray
    last_pdf_implicit: jnp.ndarray
    last_cos_th: jnp.ndarray
    last_light_pick: jnp.ndarray
    shadow_len: jnp.ndarray
    first_diffuse_hit: Optional[jnp.ndarray] = None  # bool, denoiser only


class WfState(NamedTuple):
    pool: WfPool
    film: Film
    spp: jnp.ndarray          # [num_pixels] int32 samples per pixel
    curr_pixel: jnp.ndarray   # scalar int32 ring cursor
    features: Optional[FeatureFilm] = None  # denoiser guide buffers


class WfCounters(NamedTuple):
    """Queue-length analogue (geom.h:263-277), one scalar per 'queue'."""
    raygen: jnp.ndarray
    extension: jnp.ndarray
    shadow: jnp.ndarray
    splatted: jnp.ndarray


def _block_geom(config: RenderConfig):
    """Static block-pool pixel geometry: (P true pixels per group, Pk
    padded). Group g owns true pixels [g*P, g*P + len_g)."""
    p_true = -(-config.num_pixels // config.groups)
    pk = -(-p_true // 128) * 128
    return p_true, pk


def padded_to_true_pid(config: RenderConfig, idx):
    """Block-ring padded pixel index (group g, slot k -> g*Pk + k) to the
    TRUE pixel id (g*P + k). Identity when the pool isn't block-bound."""
    if not config.block_ring:
        return idx
    p_true, pk = _block_geom(config)
    return (idx // pk) * p_true + jnp.mod(idx, pk)


def unpad_pixels(arr, config: RenderConfig):
    """Padded per-pixel array [G*Pk(, C)] -> true layout [num_pixels(, C)].
    Identity when the block pool is off."""
    if not config.block_ring:
        return arr
    p_true, pk = _block_geom(config)
    g = arr.shape[0] // pk
    return arr.reshape((g, pk) + arr.shape[1:])[:, :p_true].reshape(
        (g * p_true,) + arr.shape[1:])[:config.num_pixels]


def pad_pixels(arr, config: RenderConfig, fill=0):
    """True per-pixel array [num_pixels(, C)] -> padded block layout
    [G*Pk(, C)] (inverse of unpad_pixels). ``fill`` lands in dead slots —
    pass the parked sentinel for spp arrays."""
    if not config.block_ring:
        return arr
    p_true, pk = _block_geom(config)
    g = config.groups
    total = g * p_true
    tail = arr.shape[1:]
    if total > arr.shape[0]:
        arr = jnp.concatenate(
            [arr, jnp.full((total - arr.shape[0],) + tail, fill, arr.dtype)])
    m = arr.reshape((g, p_true) + tail)
    pad_cfg = [(0, 0)] * m.ndim
    pad_cfg[1] = (0, pk - p_true)
    m = jnp.pad(m, pad_cfg, constant_values=fill)
    return m.reshape((g * pk,) + tail)


def wf_reset(config: RenderConfig, num_tasks: int, world_radius=1.0) -> WfState:
    """wf_reset.cl: clear film, reset pool, seed = gid. path_len = -1 marks
    paths as pre-birth: the first segment regenerates them without splatting.

    Block mode (config.block_ring): film/spp live in the padded [G*Pk]
    layout; the ring cursor becomes one cursor per group; padded dead
    pixels' spp is parked at a huge value so exact-spp termination
    (min over spp) ignores them."""
    n = num_tasks
    if config.block_ring:
        # canonical geometry validation (raises on num_tasks % groups,
        # groups > pixels, non-GB-multiple group counts) — wf_reset is
        # the single entry point every pool passes through
        config.block_plan(num_tasks)
    # FLT_SEED_SALT: statistically independent replica render, used by
    # tools/make_goldens.py --floor to MEASURE each milestone's
    # independent-render noise floor (the quantity the golden gates must
    # sit at <= 1.3x of). salt=0 (default) keeps the reference's
    # seed-equals-gid init bit-exactly (wf_reset.cl).
    salt = flags.env_int("SEED_SALT", 0)
    seed0 = jnp.arange(n, dtype=jnp.uint32)
    if salt:
        from ..rng import burtle_hash
        seed0 = burtle_hash(seed0 ^ jnp.uint32((salt * 0x9E3779B9)
                                               & 0xFFFFFFFF))
    z = jnp.zeros(n, jnp.float32)
    pool = WfPool(
        orig=Vec3(z, z, z), dir=Vec3(z, z, jnp.ones(n)),
        shadow_orig=Vec3(z, z, z), shadow_dir=Vec3(z, z, jnp.ones(n)),
        T=Vec3.ones(n), Ei=Vec3.zeros(n),
        last_bsdf=Vec3.zeros(n), last_emission=Vec3.zeros(n),
        last_T=Vec3.zeros(n),
        last_pdf_w=jnp.ones(n, jnp.float32),
        path_len=jnp.full(n, -1, jnp.int32),
        seed=seed0,
        last_specular=jnp.ones(n, bool),
        shadow_blocked=jnp.ones(n, bool),
        shadow_pending=jnp.zeros(n, bool),
        pixel_index=jnp.zeros(n, jnp.int32),
        last_pdf_direct=z, last_pdf_implicit=z, last_cos_th=z,
        last_light_pick=jnp.ones(n, jnp.float32),
        shadow_len=jnp.full(n, 2.0 * world_radius, jnp.float32),
        first_diffuse_hit=(jnp.zeros(n, bool) if config.denoiser else None))
    if config.block_ring:
        p_true, pk = _block_geom(config)
        npix = config.groups * pk
        gi = jnp.arange(npix, dtype=jnp.int32) // pk
        li = jnp.arange(npix, dtype=jnp.int32) % pk
        live = li < jnp.clip(config.num_pixels - gi * p_true, 1, p_true)
        spp0 = jnp.where(live, 0, jnp.int32(1 << 29))
        curr0 = jnp.zeros(config.groups, jnp.int32)
    else:
        npix = config.num_pixels
        spp0 = jnp.zeros(npix, jnp.int32)
        curr0 = jnp.zeros((), jnp.int32)
    return WfState(pool=pool, film=Film.zeros(npix),
                   spp=spp0,
                   curr_pixel=curr0,
                   features=(FeatureFilm.zeros(npix)
                             if config.denoiser else None))


def _rank_rows(m, exact01: bool):
    """Exclusive per-row prefix sums of an int [R, C] matrix (C <= 1024)
    as ONE strict-lower-triangular MXU product instead of jnp.cumsum —
    the sparsecore scan offload this replaces cost ~27 ms/segment
    @1M lanes (scan + chunk-merge fusions + staging). exact01: entries
    are 0/1, so bf16 factors are exact (one fast pass); count layers use
    f32 HIGHEST (exact to 2^24). Returns (rank [R, C], tot [R]) int32."""
    r, c = m.shape
    src = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    lt = src < dst
    dims = (((1,), (0,)), ((), ()))
    if exact01:
        rank = jax.lax.dot_general(
            m.astype(jnp.bfloat16), lt.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
        tot = jax.lax.dot_general(
            m.astype(jnp.bfloat16), jnp.ones((c, 1), jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    else:
        mf = m.astype(jnp.float32)
        rank = jax.lax.dot_general(mf, lt.astype(jnp.float32), dims,
                                   precision=jax.lax.Precision.HIGHEST)
        tot = jax.lax.dot_general(mf, jnp.ones((c, 1), jnp.float32), dims,
                                  precision=jax.lax.Precision.HIGHEST)
    return rank.astype(jnp.int32), tot[:, 0].astype(jnp.int32)


def exclusive_rank(mask):
    """Exclusive prefix count of a flat bool [n] via hierarchical
    triangular matmuls (row-local ranks + row-offset layers) — zero scan
    offloads. Returns (rank [n] int32, total int32)."""
    n = mask.shape[0]
    c = min(n, 1024)
    while n % c:
        c //= 2
    rank, tot = _rank_rows(mask.astype(jnp.int32).reshape(n // c, c), True)
    r = n // c
    if r == 1:
        return rank.reshape(n), tot[0]
    c2 = min(r, 1024)
    while r % c2:
        c2 //= 2
    rank2, tot2 = _rank_rows(tot.reshape(r // c2, c2), False)
    if r // c2 == 1:
        offs = rank2.reshape(r)
        total = tot2[0]
    else:
        rank3, tot3 = _rank_rows(tot2.reshape(1, r // c2), False)
        offs = (rank2 + rank3.reshape(-1)[:, None]).reshape(r)
        total = tot3[0]
    return (rank + offs[:, None]).reshape(n), total


def wf_segment(scene: DeviceScene, params: RenderParams, state: WfState,
               config: RenderConfig, first_iteration: bool = False,
               pixel_base=None):
    """Advance the wavefront one segment: extension trace + shadow trace of
    the previous segment's rays, logic (implicit hits, NEE resolve, splat,
    RR), NEE generation, material sampling, ray regeneration.
    Returns (state, counters).

    Multi-chip: the pixel ring spans ``[pixel_base, pixel_base +
    len(film))`` — under shard_map each shard owns a disjoint pixel
    sub-ring (its film/spp slice) and a private pool slice + ring cursor,
    so the whole segment is shard-local (clcontext.cpp:917-927 ring
    semantics preserved per shard; see parallel/mesh.py)."""
    raw, occluded = wf_trace_phase(scene, state.pool, params, config)
    hit, sp = wf_resolve_phase(scene, state.pool, params, config, raw)
    return wf_logic_phase(scene, params, state, config, hit, sp, occluded,
                          first_iteration, pixel_base)


def wf_trace_phase(scene: DeviceScene, pool: WfPool, params: RenderParams,
                   config: RenderConfig):
    """Extension + shadow traces for the rays staged last segment
    (wf_extrays.cl / wf_shadowrays.cl). Split out so the renderer can
    dispatch it as its own program — the coherence sorts then run far
    from the resolve/logic programs' offload ops, which contend when
    everything is fused into one program on this TPU. Returns
    (raw, occluded) where raw = (t, winner_col) on the MXU path or None
    (plain-JAX backends resolve inside trace_extension)."""
    cfg = config
    light = params.area_light if cfg.use_area_light else None
    raw = None
    has_raw = scene.mxu is not None and (scene.mxu.attrs is not None
                                         or scene.mxu.attr_b16 is not None
                                         or scene.mxu.b16t is not None)
    # non-pending lanes get tmax=0: the coherence sort pushes them to the
    # tail tiles, whose candidate lists are empty -> near-free occupancy cut
    shadow_tmax = jnp.where(pool.shadow_pending, pool.shadow_len, 0.0)
    from ..accel import mxu_trace as mt
    if (has_raw and mt.SORT_RAYS and cfg.backend == "mxu"
            and flags.env_bool("PAIR_SORT", True)
            and flags.env("KEY", "oct") == "oct"):
        # shared-order pair trace: one sort + one unsort for both ray sets
        return trace_pair(pool.orig, pool.dir, pool.shadow_orig,
                          pool.shadow_dir, shadow_tmax, scene, light,
                          jnp.asarray(cfg.use_area_light))
    if has_raw:
        raw = trace_extension_raw(pool.orig, pool.dir, scene)
    occluded = trace_shadow(pool.shadow_orig, pool.shadow_dir, shadow_tmax,
                            scene, light, jnp.asarray(cfg.use_area_light))
    return raw, occluded


def wf_resolve_phase(scene: DeviceScene, pool: WfPool, params: RenderParams,
                     config: RenderConfig, raw):
    """Winner-attribute resolve + hit construction (its own dispatch on
    the phased path: one pallas call with zero offload ops)."""
    cfg = config
    light = params.area_light if cfg.use_area_light else None
    return trace_extension(pool.orig, pool.dir, scene, light,
                           jnp.asarray(cfg.sample_impl and
                                       cfg.use_area_light),
                           want_shading=True, raw=raw)


def wf_shade_phase(scene: DeviceScene, params: RenderParams, state: WfState,
                   config: RenderConfig, raw, occluded,
                   first_iteration: bool = False, pixel_base=None,
                   defer_splat: bool = False):
    """Resolve + logic in ONE program (the resolve pallas call has no
    offload ops, so it does not contend with the logic phase's
    gathers/scatter — and one dispatch boundary less means less operand
    staging)."""
    hit, sp = wf_resolve_phase(scene, state.pool, params, config, raw)
    return wf_logic_phase(scene, params, state, config, hit, sp, occluded,
                          first_iteration, pixel_base, defer_splat)


def wf_logic_phase(scene: DeviceScene, params: RenderParams, state: WfState,
                   config: RenderConfig, hit, sp, occluded,
                   first_iteration: bool = False, pixel_base=None,
                   defer_splat: bool = False):
    """Logic + shading + NEE + material sampling + raygen + splat — the
    post-trace half of the segment (wf_logic.cl onward). With
    defer_splat (static; throughput mode only) the film is left
    untouched and (seg, rgbw) splat records are returned as a third
    output for batched application via apply_splats."""
    cfg = config
    pool = state.pool
    n = pool.seed.shape[0]
    use_env = cfg.use_env_map and scene.env is not None
    light = params.area_light if cfg.use_area_light else None
    # ring size = the film slice this segment owns (== num_pixels when
    # unsharded; the per-shard slice under shard_map)
    num_pixels = state.film.weight.shape[0]
    if pixel_base is None:
        pixel_base = jnp.int32(0)
    block = cfg.block_ring
    if block:
        from . import block_splat as bs
        p_true, pk_ = _block_geom(cfg)
        g_local = num_pixels // pk_        # groups this shard owns
        s_ = n // g_local                  # lanes per group
        # block kernels run in interpret/segment_sum mode off-TPU (tests)
        b_interp = cfg.backend != "mxu"
        lpid = pool.pixel_index - pixel_base   # local padded pixel id
        lane_g = jnp.arange(n, dtype=jnp.int32) // s_

    seed = pool.seed
    T = pool.T
    Ei = pool.Ei

    plen = pool.path_len + 1
    shadow_blocked = jnp.where(pool.shadow_pending, occluded, True)

    # =====================================================================
    # LOGIC (wf_logic.cl)
    # =====================================================================
    terminate = plen <= 0   # pre-birth paths regenerate without splatting
    if cfg.max_bounces > 0:
        terminate |= plen >= (cfg.max_bounces + 1)

    if cfg.use_roulette:
        u_rr, seed = rand(seed)
        cp = jnp.clip(luminance(T), 0.01, 0.5)
        rr = ~terminate & (plen > MIN_PATH_LENGTH)
        terminate |= rr & (u_rr > cp)
        T = vwhere(rr, T / cp, T)           # compensation (wf_logic.cl:72)

    max_samples_reached = jnp.zeros(n, bool)
    if cfg.max_spp > 0:
        # cap VALUE is dynamic (params.max_spp) so spp retargets don't
        # recompile; cfg.max_spp doubles as gate and fallback value
        spp_cap = jnp.where(params.max_spp > 0, params.max_spp,
                            jnp.int32(cfg.max_spp))
        if block:
            # dense per-group fetch instead of a [n] gather
            pix_spp = bs.fetch(lpid % pk_,
                               state.spp.astype(jnp.float32)[None, :],
                               groups=g_local,
                               interpret=b_interp).astype(jnp.int32)
        else:
            pix_spp = jnp.take(state.spp, pool.pixel_index - pixel_base)
        max_samples_reached = pix_spp >= spp_cap
        terminate |= max_samples_reached

    terminate |= is_zero(T) | (pool.last_pdf_w == 0.0)

    # ---- implicit environment hit (wf_logic.cl:98-122) -------------------
    miss = (hit.i < 0) & ~terminate & (plen > 0)
    if use_env:
        first_or_impl = (plen == 1) | jnp.asarray(cfg.sample_impl)
        bg_raw, direct_pdf = env_radiance_and_pdf(scene.env, pool.dir,
                                                  cfg.fast_env)
        bg = bg_raw * params.env_map_strength
        bg = vwhere(first_or_impl, bg, Vec3.zeros(n))
        w = jnp.ones(n, jnp.float32)
        if cfg.sample_impl and cfg.sample_expl:
            actual = pool.last_pdf_w * pool.last_light_pick
            w_mis = actual / jnp.maximum(actual + direct_pdf, 1e-30)
            use_mis = (plen > 1) & ~pool.last_specular
            w = jnp.where(use_mis, w_mis, w)
        Ei = vwhere(miss, Ei + T * bg * w, Ei)
    terminate |= hit.i < 0

    # ---- implicit area light hit (wf_logic.cl:124-147) --------------------
    if light is not None:
        al = (hit.area_light_hit > 0) & ~terminate
        mis_w = jnp.ones(n, jnp.float32)
        if cfg.sample_expl:
            pdf_a = 1.0 / (4.0 * light.size_x * light.size_y)
            dist = length(hit.P - pool.orig)
            pdf_w = pdf_area_to_solid_angle(pdf_a, dist,
                                            -dot(pool.dir, hit.N))
            w_mis = pool.last_pdf_w / jnp.maximum(
                pool.last_pdf_w + pdf_w * pool.last_light_pick, 1e-30)
            use_mis = (plen > 1) & ~pool.last_specular
            mis_w = jnp.where(use_mis, w_mis, mis_w)
        Ei = vwhere(al, Ei + T * light.E * mis_w, Ei)
        terminate |= al

    # ---- NEE shadow-ray resolution (wf_logic.cl:149-168) ------------------
    if cfg.sample_expl:
        unblocked = ~shadow_blocked
        denom = (pool.last_light_pick * pool.last_pdf_direct
                 + (1.0 if cfg.sample_impl else 0.0) * pool.last_pdf_implicit)
        contrib = pool.last_bsdf * pool.last_T * pool.last_emission * (
            pool.last_cos_th / jnp.maximum(denom, 1e-30))
        Ei = vwhere(unblocked, Ei + contrib, Ei)

    # ---- splat terminated paths (wf_logic.cl:171-205) ---------------------
    splat = terminate & (plen > 0)
    if cfg.max_spp > 0:
        splat &= ~max_samples_reached
        if not block:
            # EXACT spp cap (improves on the reference's racy double-check,
            # wf_logic.cl:76-84 / mk_splat.cl:21-34): rank each pixel's
            # splatting lanes within the segment (two lax.sorts, no
            # gathers) and admit only as many as the pixel's remaining
            # budget. (Block mode ranks inside the dense splat kernel.)
            lane = jnp.arange(n, dtype=jnp.int32)
            key = jnp.where(splat, pool.pixel_index, jnp.int32(0x7FFFFFFF))
            skey, slane = jax.lax.sort((key, lane), num_keys=1)
            pos = jnp.arange(n, dtype=jnp.int32)
            newrun = jnp.concatenate([jnp.ones(1, bool),
                                      skey[1:] != skey[:-1]])
            runstart = jax.lax.cummax(jnp.where(newrun, pos, 0))
            rank_sorted = pos - runstart
            _, rank = jax.lax.sort((slane, rank_sorted), num_keys=1)
            splat &= rank < (spp_cap - pix_spp)
    film = state.film

    splat_records = None
    n_splatted = None
    if block:
        # dense per-group accumulation (core/block_splat.py) — no scatter.
        # Channel-major [C, n] stacks: narrow [n, C] row-matrices are
        # lane-padded to 128 by TPU tiling (≈32x the bytes)
        data_t = jnp.stack([jnp.where(splat, Ei.x, 0.0),
                            jnp.where(splat, Ei.y, 0.0),
                            jnp.where(splat, Ei.z, 0.0),
                            splat.astype(jnp.float32)], axis=0)
        local_col = jnp.where(splat, lpid % pk_, -1)
        fmat = jnp.stack([film.color.x, film.color.y, film.color.z,
                          film.weight], axis=0)
        if cfg.max_spp > 0:
            remaining = jnp.maximum(spp_cap - state.spp, 0) \
                .astype(jnp.float32)[None, :]
            new_mat = bs.splat(local_col, data_t, fmat, groups=g_local,
                               remaining=remaining, interpret=b_interp)
            delta_w = new_mat[3] - film.weight
            spp_counts = state.spp + jnp.round(delta_w).astype(jnp.int32)
            n_splatted = jnp.round(jnp.sum(delta_w)).astype(jnp.int32)
        else:
            new_mat = bs.splat(local_col, data_t, fmat, groups=g_local,
                               interpret=b_interp)
            spp_counts = state.spp
        film = Film(color=Vec3(new_mat[0], new_mat[1], new_mat[2]),
                    weight=new_mat[3])
    else:
        # one 4-channel scatter instead of four 1-channel ones — scatters
        # take the same slow path as gathers on this TPU, so passes are
        # minimized
        data = jnp.stack([jnp.where(splat, Ei.x, 0.0),
                          jnp.where(splat, Ei.y, 0.0),
                          jnp.where(splat, Ei.z, 0.0),
                          splat.astype(jnp.float32)], axis=1)
    if defer_splat and not block:
        # throughput mode: hand the (pixel, rgbw) records to the caller,
        # which batches K segments into ONE segment_sum — the scatter's
        # num_segments-proportional cost (~30 ms @2M pixels) amortizes
        seg = jnp.where(splat, pool.pixel_index - pixel_base, num_pixels)
        splat_records = (seg, data)
        spp_counts = state.spp
    elif not block:
        seg = jnp.where(splat, pool.pixel_index - pixel_base,
                        num_pixels)  # overflow bucket
        acc = jax.ops.segment_sum(data, seg,
                                  num_segments=num_pixels + 1)[:num_pixels]
        film = Film(
            color=Vec3(film.color.x + acc[:, 0], film.color.y + acc[:, 1],
                       film.color.z + acc[:, 2]),
            weight=film.weight + acc[:, 3])
        spp_counts = state.spp
        if cfg.max_spp > 0:
            spp_counts = jnp.minimum(
                spp_counts + jax.ops.segment_sum(
                    splat.astype(jnp.int32), seg,
                    num_segments=num_pixels + 1)[:num_pixels],
                spp_cap)

    # =====================================================================
    # Shading (surviving paths): normal map + NEE generation + material
    # =====================================================================
    alive = ~terminate
    if sp is None:
        sp = resolve_material(scene.mats, hit.mat_id, hit.uv_u, hit.uv_v,
                              scene.atlas)
    else:
        from ..bsdf import apply_textures
        sp = apply_textures(sp, hit.uv_u, hit.uv_v, scene.atlas)

    # ---- implicit triangle emission (improvement: the reference's
    # wf_mat_emissive.cl:44-66 never adds Ke to Ei, so emissive meshes
    # render black there; weight-1 implicit accumulation is unbiased —
    # emissive surfaces are never NEE-sampled as lights). The path then
    # continues with bxdf_sample's pdf=0 and splats next segment via the
    # standard last_pdf_w==0 termination.
    em = alive & (hit.i >= 0) & (sp.type == bx.BXDF_EMISSIVE)
    Ei = vwhere(em, Ei + T * sp.Ke, Ei)

    nrm = tangent_space_normal(hit, scene.tris, sp.map_N, scene.atlas,
                               meta=sp.n_meta)
    backface = dot(nrm, pool.dir) > 0.0
    nrm = vwhere(backface, -nrm, nrm)
    nee_orig = hit.P - pool.dir * 1e-3

    singular = (sp.type & bx.BXDF_SINGULAR_MASK) != 0

    # ---- denoiser guide features (wf_logic.cl:214-237) --------------------
    features = state.features
    first_diffuse = pool.first_diffuse_hit
    if cfg.denoiser:
        cam = params.camera
        nm = alive & (plen == 1)   # first hit: camera-space normal
        cs = Vec3(dot(cam.right, nrm), dot(cam.up, nrm), -dot(cam.dir, nrm))
        am = alive & ~singular & ~first_diffuse   # first non-singular hit
        first_diffuse = jnp.where(terminate, False,
                                  first_diffuse | (alive & ~singular))
        if block:
            fdata_t = jnp.stack([
                jnp.where(am, sp.Kd.x, 0.0), jnp.where(am, sp.Kd.y, 0.0),
                jnp.where(am, sp.Kd.z, 0.0), am.astype(jnp.float32),
                jnp.where(nm, cs.x, 0.0), jnp.where(nm, cs.y, 0.0),
                jnp.where(nm, cs.z, 0.0), nm.astype(jnp.float32)], axis=0)
            f_local = jnp.where(nm | am, lpid % pk_, -1)
            f_prev = jnp.stack([
                features.albedo.x, features.albedo.y, features.albedo.z,
                features.albedo_w, features.normal.x, features.normal.y,
                features.normal.z, features.normal_w], axis=0)
            f_new = bs.splat(f_local, fdata_t, f_prev, groups=g_local,
                             interpret=b_interp)
            features = FeatureFilm(
                albedo=Vec3(f_new[0], f_new[1], f_new[2]),
                albedo_w=f_new[3],
                normal=Vec3(f_new[4], f_new[5], f_new[6]),
                normal_w=f_new[7])
        else:
            fdata = jnp.stack([
                jnp.where(am, sp.Kd.x, 0.0), jnp.where(am, sp.Kd.y, 0.0),
                jnp.where(am, sp.Kd.z, 0.0), am.astype(jnp.float32),
                jnp.where(nm, cs.x, 0.0), jnp.where(nm, cs.y, 0.0),
                jnp.where(nm, cs.z, 0.0), nm.astype(jnp.float32)], axis=1)
            fseg = jnp.where(nm | am, pool.pixel_index - pixel_base,
                             num_pixels)
            facc = jax.ops.segment_sum(
                fdata, fseg, num_segments=num_pixels + 1)[:num_pixels]
            features = FeatureFilm(
                albedo=Vec3(features.albedo.x + facc[:, 0],
                            features.albedo.y + facc[:, 1],
                            features.albedo.z + facc[:, 2]),
                albedo_w=features.albedo_w + facc[:, 3],
                normal=Vec3(features.normal.x + facc[:, 4],
                            features.normal.y + facc[:, 5],
                            features.normal.z + facc[:, 6]),
                normal_w=features.normal_w + facc[:, 7])

    shadow_pending = jnp.zeros(n, bool)
    shadow_orig, shadow_dir = pool.shadow_orig, pool.shadow_dir
    shadow_len = pool.shadow_len
    l_pdf_direct, l_cos_th = pool.last_pdf_direct, pool.last_cos_th
    l_pick, l_emission = pool.last_light_pick, pool.last_emission

    if cfg.sample_expl:
        do_nee = alive & ~singular
        env_prob = (float(cfg.use_env_map) /
                    max(1, int(cfg.use_env_map) + int(cfg.use_area_light)))
        u_pick, seed = rand(seed)
        pick_env = u_pick < env_prob
        use_env_s = do_nee & pick_env
        use_area_s = do_nee & ~pick_env & jnp.asarray(cfg.use_area_light)

        if use_env:
            u_env, seed = rand(seed)
            L, direct_pdf, env_raw = env_sample(scene.env, u_env, cfg.fast_env)
            env_li = env_raw * params.env_map_strength
            len_l = jnp.broadcast_to(params.world_radius * 2.0, (n,))
            cos_th = jnp.maximum(0.0, dot(L, nrm))
            m = use_env_s
            shadow_orig = vwhere(m, nee_orig, shadow_orig)
            shadow_dir = vwhere(m, L, shadow_dir)
            shadow_len = jnp.where(m, len_l, shadow_len)
            l_pdf_direct = jnp.where(m, direct_pdf, l_pdf_direct)
            l_cos_th = jnp.where(m, cos_th, l_cos_th)
            l_pick = jnp.where(m, env_prob, l_pick)
            l_emission = vwhere(m, env_li, l_emission)
            shadow_pending |= m

        if light is not None:
            pdf_a, pos_l, seed = sample_area_light(light, seed)
            Lv = pos_l - nee_orig
            len0 = length(Lv)
            inv_len = 1.0 / jnp.maximum(len0, 1e-30)
            Ln = Lv * inv_len
            cos_light = jnp.maximum(dot(light.N, -Lv), 0.0)  # unnormalized L
            ok = use_area_s & (cos_light > 0.0)
            len_l = len0 * 0.995                    # wf_logic.cl:308
            direct_pdf = pdf_area_to_solid_angle(pdf_a, len_l,
                                                 cos_light * inv_len)
            cos_th = jnp.maximum(0.0, dot(Ln, nrm))
            shadow_orig = vwhere(ok, nee_orig, shadow_orig)
            shadow_dir = vwhere(ok, Ln, shadow_dir)
            shadow_len = jnp.where(ok, len_l, shadow_len)
            l_pdf_direct = jnp.where(ok, direct_pdf, l_pdf_direct)
            l_cos_th = jnp.where(ok, cos_th, l_cos_th)
            l_pick = jnp.where(ok, 1.0 - env_prob, l_pick)
            l_emission = vwhere(ok, Vec3(
                jnp.broadcast_to(light.E.x, (n,)),
                jnp.broadcast_to(light.E.y, (n,)),
                jnp.broadcast_to(light.E.z, (n,))), l_emission)
            shadow_pending |= ok

    # ---- material phase (wf_mat_*.cl) -------------------------------------
    nee_bsdf = bxdf_eval(nrm, sp, backface, pool.dir, shadow_dir,
                         cfg.material_types)
    nee_pdf = jnp.maximum(0.0, bxdf_pdf(nrm, sp, backface, pool.dir,
                                        shadow_dir, cfg.material_types))
    d_new, pdf_w, f, seed = bxdf_sample(nrm, sp, backface, pool.dir, seed,
                                        cfg.material_types)
    bad = (pdf_w == 0.0) | is_zero(f)
    new_T = vwhere(bad, Vec3.zeros(n),
                   T * f * (dot(nrm, d_new) / jnp.where(bad, 1.0, pdf_w)))
    cont_orig = hit.P + d_new * 1e-4

    # =====================================================================
    # RAYGEN for terminated paths (wf_raygen.cl) — pixel ring
    # =====================================================================
    if block:
        # one ring per pixel group: a lane always regenerates within its
        # group's true-pixel range [g*P, g*P + len_g). Ranks via the
        # triangular MXU product (_rank_rows), not a sparsecore scan.
        term_i = terminate.astype(jnp.int32).reshape(g_local, s_)
        if s_ <= 1024:
            rank2, n_term_g = _rank_rows(term_i, True)
        else:   # huge pools: the [s, s] triangular factor stops paying
            rank2 = jnp.cumsum(term_i, axis=1) - term_i
            n_term_g = jnp.sum(term_i, axis=1)
        n_regen = jnp.sum(n_term_g)
        g0 = pixel_base // pk_
        g_row = g0 + jnp.arange(g_local, dtype=jnp.int32)
        len_g = jnp.clip(cfg.num_pixels - g_row * p_true, 1, p_true)
        new_l = jnp.mod(state.curr_pixel[:, None] + rank2, len_g[:, None])
        new_pixel = pixel_base + lane_g * pk_ + new_l.reshape(n)
        curr_out = jnp.mod(state.curr_pixel + n_term_g, len_g)
        pixel_index = jnp.where(terminate, new_pixel, pool.pixel_index)
        # camera rays address TRUE pixels; padded id -> true id
        cam_pid = padded_to_true_pid(cfg, pixel_index)
    else:
        rank, n_regen = exclusive_rank(terminate)
        new_pixel = pixel_base + jnp.mod(state.curr_pixel + rank, num_pixels)
        curr_out = jnp.mod(state.curr_pixel + n_regen, num_pixels)
        pixel_index = jnp.where(terminate, new_pixel, pool.pixel_index)
        cam_pid = pixel_index
    cam_orig, cam_dir, seed = generate_camera_rays(
        cam_pid, params.camera, cfg.width, cfg.height,
        params.world_radius, seed)

    # merge: terminated -> fresh camera path; alive -> continuation
    orig = vwhere(terminate, cam_orig, cont_orig)
    direc = vwhere(terminate, cam_dir, d_new)
    T_out = vwhere(terminate, Vec3.ones(n), new_T)
    Ei_out = vwhere(terminate, Vec3.zeros(n), Ei)
    plen_out = jnp.where(terminate, 0, plen)
    last_pdf_w = jnp.where(terminate, 1.0, pdf_w)
    last_specular = jnp.where(terminate, True, singular)
    last_T = vwhere(terminate, Vec3.zeros(n), T)
    shadow_pending &= ~terminate
    l_pdf_direct = jnp.where(terminate, 0.0, l_pdf_direct)
    l_pdf_implicit = jnp.where(terminate, 0.0, nee_pdf)
    l_cos_th = jnp.where(terminate, 0.0, l_cos_th)
    l_pick = jnp.where(terminate, 1.0, l_pick)
    l_emission = vwhere(terminate, Vec3.zeros(n), l_emission)
    nee_bsdf = vwhere(terminate, Vec3.zeros(n), nee_bsdf)

    new_pool = WfPool(
        orig=orig, dir=direc,
        shadow_orig=shadow_orig, shadow_dir=shadow_dir,
        T=T_out, Ei=Ei_out,
        last_bsdf=nee_bsdf, last_emission=l_emission, last_T=last_T,
        last_pdf_w=last_pdf_w, path_len=plen_out, seed=seed,
        last_specular=last_specular,
        shadow_blocked=jnp.ones(n, bool),   # resolved next segment
        shadow_pending=shadow_pending,
        pixel_index=pixel_index,
        last_pdf_direct=l_pdf_direct, last_pdf_implicit=l_pdf_implicit,
        last_cos_th=l_cos_th, last_light_pick=l_pick,
        shadow_len=shadow_len,
        first_diffuse_hit=first_diffuse)

    counters = WfCounters(
        raygen=n_regen,
        extension=jnp.asarray(n, jnp.int32),
        shadow=jnp.sum(shadow_pending.astype(jnp.int32)),
        splatted=(n_splatted if n_splatted is not None
                  else jnp.sum(splat.astype(jnp.int32))))

    new_state = WfState(pool=new_pool, film=film, spp=spp_counts,
                        curr_pixel=curr_out,
                        features=features)
    if defer_splat:
        return new_state, counters, splat_records
    return new_state, counters


def apply_splats(film: Film, segs, datas) -> Film:
    """Apply K segments' deferred splat records in one batched
    segment_sum (the scatter's num_segments-proportional cost amortizes
    over K). segs: [K, n] int32 pixel ids (num_pixels = overflow);
    datas: [K, n, 4] rgbw."""
    num_pixels = film.weight.shape[0]
    seg = segs.reshape(-1)
    data = datas.reshape(-1, 4)
    acc = jax.ops.segment_sum(data, seg,
                              num_segments=num_pixels + 1)[:num_pixels]
    return Film(
        color=Vec3(film.color.x + acc[:, 0], film.color.y + acc[:, 1],
                   film.color.z + acc[:, 2]),
        weight=film.weight + acc[:, 3])
