"""Exact-spp "megastep" integrator — the TPU-native analogue of the
reference's microkernel path (mk_raygen / mk_next_vertex / mk_sample_bsdf /
mk_splat, driven by Tracer::renderSingle, tracer.cpp:108-182).

One call renders exactly one sample for every pixel: camera rays, then a
fixed ``max_bounces + 1`` unrolled-by-lax.fori bounce loop where each bounce
fuses the reference's nextVertex (trace + implicit light accumulation with
MIS, mk_next_vertex.cl:72-117) and sampleBsdf (inline NEE for env + area
light, RR, BSDF continuation, mk_sample_bsdf.cl:68-187). The per-pixel phase
machine becomes an ``alive`` mask; all kernels fuse into one jitted step.

MIS weights, offsets (1e-3 shadow origin, 1e-4 continuation origin) and the
lightPickProb = 1 convention of the microkernel path are kept bit-for-bit.
"""

from __future__ import annotations

from typing import NamedTuple

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
from .trace import (DeviceScene, tangent_space_normal, trace_extension,
                    trace_shadow)


class Film(NamedTuple):
    color: Vec3          # [num_pixels] accumulated radiance
    weight: jnp.ndarray  # [num_pixels] sample counts

    @staticmethod
    def zeros(num_pixels: int) -> "Film":
        return Film(Vec3.zeros(num_pixels), jnp.zeros(num_pixels, jnp.float32))


class FeatureFilm(NamedTuple):
    """Denoiser guide buffers (the reference's denoiserAlbedo /
    denoiserNormal PBOs, clcontext.cpp:337-402): per-pixel accumulated
    first-diffuse-hit albedo and first-hit camera-space normal, each with
    its own accumulation weight."""
    albedo: Vec3
    albedo_w: jnp.ndarray
    normal: Vec3
    normal_w: jnp.ndarray

    @staticmethod
    def zeros(num_pixels: int) -> "FeatureFilm":
        z = jnp.zeros(num_pixels, jnp.float32)
        return FeatureFilm(Vec3.zeros(num_pixels), z,
                           Vec3.zeros(num_pixels), z)


class RenderStats(NamedTuple):
    """Counter pytree (geom.h:279-285 analogue); scalars, psum-able."""
    primary_rays: jnp.ndarray
    extension_rays: jnp.ndarray
    shadow_rays: jnp.ndarray
    samples: jnp.ndarray

    @staticmethod
    def zeros():
        z = jnp.zeros((), jnp.int32)
        return RenderStats(z, z, z, z)

    def __add__(self, o):
        return RenderStats(self.primary_rays + o.primary_rays,
                           self.extension_rays + o.extension_rays,
                           self.shadow_rays + o.shadow_rays,
                           self.samples + o.samples)


def render_sample(scene: DeviceScene, params: RenderParams, film: Film,
                  seed, config: RenderConfig, features: FeatureFilm = None):
    """One sample per pixel. Returns (film, seed, stats), plus the updated
    ``features`` when ``config.denoiser`` is set (guide-buffer accumulation,
    wf_logic.cl:214-237 semantics on the microkernel path).

    Jit with config static: e.g. ``jax.jit(render_sample,
    static_argnames="config")``.
    """
    cfg = config
    n = cfg.num_pixels
    use_env = cfg.use_env_map and scene.env is not None
    light = params.area_light if cfg.use_area_light else None

    pixel_idx = jnp.arange(n, dtype=jnp.int32)
    orig, d, seed = generate_camera_rays(
        pixel_idx, params.camera, cfg.width, cfg.height,
        params.world_radius, seed)

    state = dict(
        orig=orig, dir=d, seed=seed,
        T=Vec3.ones(n), Ei=Vec3.zeros(n),
        alive=jnp.ones(n, bool),
        last_pdf_w=jnp.ones(n, jnp.float32),
        last_specular=jnp.ones(n, bool),
        shadow_count=jnp.zeros((), jnp.int32),
        ext_count=jnp.zeros((), jnp.int32),
    )
    if cfg.denoiser:
        state.update(
            first_diffuse=jnp.zeros(n, bool),
            feat_albedo=Vec3.zeros(n), feat_albedo_w=jnp.zeros(n, jnp.float32),
            feat_normal=Vec3.zeros(n), feat_normal_w=jnp.zeros(n, jnp.float32))

    def bounce(b, s):
        path_len = b + 1  # nextVertex increments before the implicit logic
        alive = s["alive"]
        seed = s["seed"]
        T = s["T"]
        Ei = s["Ei"]

        hit, sp_baked = trace_extension(
            s["orig"], s["dir"], scene, light,
            jnp.asarray(cfg.sample_impl and cfg.use_area_light),
            want_shading=True)
        s_ext = s["ext_count"] + jnp.sum(alive.astype(jnp.int32))

        # ---- implicit environment hit (mk_next_vertex.cl:72-95) ----------
        miss = alive & (hit.i < 0)
        if use_env:
            first_or_impl = (path_len == 1) | jnp.asarray(cfg.sample_impl)
            bg_raw, direct_pdf = env_radiance_and_pdf(scene.env, s["dir"],
                                                      cfg.fast_env)
            bg = bg_raw * params.env_map_strength
            bg = vwhere(first_or_impl, bg, Vec3.zeros(n))
            w = jnp.ones(n, jnp.float32)
            if cfg.sample_impl and cfg.sample_expl:
                actual_pdf = s["last_pdf_w"]
                w_mis = actual_pdf / jnp.maximum(actual_pdf + direct_pdf, 1e-30)
                use_mis = (path_len > 1) & ~s["last_specular"]
                w = jnp.where(use_mis, w_mis, w)
            Ei = vwhere(miss, Ei + T * bg * w, Ei)
        alive = alive & ~miss

        # ---- implicit area light hit (mk_next_vertex.cl:96-117) ----------
        if light is not None:
            al_hit = alive & (hit.area_light_hit > 0)
            mis_w = jnp.ones(n, jnp.float32)
            if cfg.sample_expl:
                pdf_a = 1.0 / (4.0 * light.size_x * light.size_y)
                dist = length(hit.P - s["orig"])
                pdf_w = pdf_area_to_solid_angle(pdf_a, dist, -dot(s["dir"], hit.N))
                w_mis = s["last_pdf_w"] / jnp.maximum(s["last_pdf_w"] + pdf_w, 1e-30)
                use_mis = (path_len > 1) & ~s["last_specular"]
                mis_w = jnp.where(use_mis, w_mis, mis_w)
            Ei = vwhere(al_hit, Ei + T * light.E * mis_w, Ei)
            alive = alive & ~al_hit

        # ---- surface shading (mk_sample_bsdf.cl) -------------------------
        if sp_baked is not None:
            from ..bsdf import apply_textures
            sp = apply_textures(sp_baked, hit.uv_u, hit.uv_v, scene.atlas)
        else:
            sp = resolve_material(scene.mats, hit.mat_id, hit.uv_u, hit.uv_v,
                                  scene.atlas)
        nrm = tangent_space_normal(hit, scene.tris, sp.map_N, scene.atlas,
                                   meta=sp.n_meta)
        backface = dot(nrm, s["dir"]) > 0.0
        nrm = vwhere(backface, -nrm, nrm)
        nee_orig = hit.P - s["dir"] * 1e-3

        # ---- implicit triangle emission (improvement: the reference's
        # wf_mat_emissive.cl:44-66 never adds Ke to Ei, so emissive meshes
        # render black there; emissive surfaces are never NEE-sampled, so
        # weight-1 implicit accumulation at every path length is unbiased)
        em = alive & (sp.type == bx.BXDF_EMISSIVE)
        Ei = vwhere(em, Ei + T * sp.Ke, Ei)
        alive = alive & ~em          # emissive terminates the path (pdf=0)

        singular = (sp.type & bx.BXDF_SINGULAR_MASK) != 0
        shadow_count = s["shadow_count"]

        # ---- denoiser guide features (wf_logic.cl:214-237) ----------------
        feat = {}
        if cfg.denoiser:
            cam = params.camera
            # first-hit normal rotated into camera space: rows right/up/-dir
            nm = alive & (path_len == 1)
            cs = Vec3(dot(cam.right, nrm), dot(cam.up, nrm),
                      -dot(cam.dir, nrm))
            # first NON-singular hit: albedo (linear-space Kd; the reference
            # feeds raw sRGB Kd — a per-channel monotonic remap, equivalent
            # as an edge guide)
            am = alive & ~singular & ~s["first_diffuse"]
            feat = dict(
                first_diffuse=s["first_diffuse"] | (alive & ~singular),
                feat_albedo=vwhere(am, s["feat_albedo"] + sp.Kd,
                                   s["feat_albedo"]),
                feat_albedo_w=s["feat_albedo_w"] + am.astype(jnp.float32),
                feat_normal=vwhere(nm, s["feat_normal"] + cs,
                                   s["feat_normal"]),
                feat_normal_w=s["feat_normal_w"] + nm.astype(jnp.float32))

        if cfg.sample_expl:
            do_nee = alive & ~singular
            light_pick_prob = 1.0  # mk convention (mk_sample_bsdf.cl:71)

            if use_env:
                u_env, seed = rand(seed)
                L, direct_pdf, env_raw = env_sample(scene.env, u_env,
                                                    cfg.fast_env)
                len_l = params.world_radius + params.world_radius
                occluded = trace_shadow(
                    nee_orig, L, jnp.full(n, 1.0, jnp.float32) * len_l, scene,
                    light, jnp.asarray(cfg.use_area_light))
                shadow_count = shadow_count + jnp.sum(do_nee.astype(jnp.int32))
                brdf = bxdf_eval(nrm, sp, backface, s["dir"], L,
                                 cfg.material_types)
                cos_th = jnp.maximum(0.0, dot(L, nrm))
                bsdf_pdf = jnp.maximum(0.0, bxdf_pdf(nrm, sp, backface,
                                                     s["dir"], L,
                                                     cfg.material_types))
                env_li = env_raw * params.env_map_strength
                denom = light_pick_prob * direct_pdf + \
                    (1.0 if cfg.sample_impl else 0.0) * bsdf_pdf
                contrib = brdf * T * env_li * (cos_th / jnp.maximum(denom, 1e-30))
                ok = do_nee & ~occluded & (direct_pdf != 0.0)
                Ei = vwhere(ok, Ei + contrib, Ei)

            if light is not None:
                pdf_a, pos_l, seed = sample_area_light(light, seed)
                L = pos_l - nee_orig
                len_l = length(L)
                L = L * (1.0 / jnp.maximum(len_l, 1e-30))
                occluded = trace_shadow(nee_orig, L, len_l, scene, None,
                                        jnp.asarray(False))
                shadow_count = shadow_count + jnp.sum(do_nee.astype(jnp.int32))
                cos_light = jnp.maximum(dot(light.N, -L), 0.0)
                brdf = bxdf_eval(nrm, sp, backface, s["dir"], L,
                                 cfg.material_types)
                cos_th = jnp.maximum(0.0, dot(L, nrm))
                direct_pdf = pdf_area_to_solid_angle(pdf_a, len_l, cos_light)
                bsdf_pdf = jnp.maximum(0.0, bxdf_pdf(nrm, sp, backface,
                                                     s["dir"], L,
                                                     cfg.material_types))
                denom = light_pick_prob * direct_pdf + \
                    (1.0 if cfg.sample_impl else 0.0) * bsdf_pdf
                contrib = brdf * T * light.E * (cos_th / jnp.maximum(denom, 1e-30))
                ok = do_nee & ~occluded & (cos_light > 0.0)
                Ei = vwhere(ok, Ei + contrib, Ei)

        # ---- Russian roulette + termination (mk_sample_bsdf.cl:148-157) --
        terminate = ~alive
        cont_prob = jnp.ones(n, jnp.float32)
        if cfg.use_roulette:
            u_rr, seed = rand(seed)
            cp = jnp.clip(luminance(T), 0.01, 0.5)
            rr_active = (path_len > MIN_PATH_LENGTH)
            cont_prob = jnp.where(rr_active, cp, 1.0)
            terminate |= rr_active & (u_rr > cp)

        # ---- continuation (mk_sample_bsdf.cl:159-187) --------------------
        d_new, pdf_w, f, seed = bxdf_sample(nrm, sp, backface, s["dir"], seed,
                                            cfg.material_types)
        pdf_w = pdf_w * cont_prob
        dead = (pdf_w == 0.0) | is_zero(f)
        terminate |= dead
        new_T = T * f * (dot(nrm, d_new) / jnp.where(pdf_w == 0.0, 1.0, pdf_w))
        new_orig = hit.P + d_new * 1e-4

        alive = alive & ~terminate
        return dict(
            orig=vwhere(alive, new_orig, s["orig"]),
            dir=vwhere(alive, d_new, s["dir"]),
            seed=seed,
            T=vwhere(alive, new_T, T),
            Ei=Ei,
            alive=alive,
            last_pdf_w=jnp.where(alive, pdf_w, s["last_pdf_w"]),
            last_specular=jnp.where(alive, singular, s["last_specular"]),
            shadow_count=shadow_count,
            ext_count=s_ext,
            **feat,
        )

    if cfg.unroll_bounces:
        # Python-level unroll: keeps every gather in straightline XLA, which
        # is mandatory for TPU throughput (in-loop gathers serialize).
        out = state
        for b in range(cfg.max_bounces + 1):
            out = bounce(b, out)
    else:
        out = jax.lax.fori_loop(0, cfg.max_bounces + 1, bounce, state)

    # ---- splat (mk_splat.cl:35-47): every path adds its Ei ----------------
    film = Film(color=film.color + out["Ei"], weight=film.weight + 1.0)
    stats = RenderStats(
        primary_rays=jnp.asarray(n, jnp.int32),
        extension_rays=out["ext_count"] - n,
        shadow_rays=out["shadow_count"],
        samples=jnp.asarray(n, jnp.int32))
    if cfg.denoiser:
        features = features or FeatureFilm.zeros(n)
        features = FeatureFilm(
            albedo=features.albedo + out["feat_albedo"],
            albedo_w=features.albedo_w + out["feat_albedo_w"],
            normal=features.normal + out["feat_normal"],
            normal_w=features.normal_w + out["feat_normal_w"])
        return film, out["seed"], stats, features
    return film, out["seed"], stats
