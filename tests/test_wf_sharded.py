"""Multi-chip wavefront: shard_map segment == per-shard local simulation.

The sharded wavefront gives every chip a private pool slice, pixel
sub-ring and film slice (parallel/mesh.py). Equality here is BIT-EXACT:
running the same per-shard segments sequentially on one device must
reproduce the shard_map result, and the psum'd counters must equal the
sum of the local ones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluctus_tpu.core.integrator_wf import WfState, wf_reset, wf_segment
from fluctus_tpu.parallel import make_mesh, replicate_scene
from fluctus_tpu.parallel.mesh import shard_wf_state, wf_segment_sharded
from fluctus_tpu.testing import quad_scene, quad_setup

D = 8
NUM_TASKS = 64 * D
WIDTH, HEIGHT = 8 * D, 8


def _slice_state(state: WfState, k: int, d: int) -> WfState:
    n = state.pool.seed.shape[0] // d
    p = state.film.weight.shape[0] // d
    pool = jax.tree_util.tree_map(lambda a: a[k * n:(k + 1) * n], state.pool)
    film = jax.tree_util.tree_map(lambda a: a[k * p:(k + 1) * p], state.film)
    return WfState(pool=pool, film=film,
                   spp=state.spp[k * p:(k + 1) * p],
                   curr_pixel=jnp.zeros((), jnp.int32))


@pytest.mark.parametrize("use_area_light", [False, True])
def test_sharded_equals_local_simulation(use_area_light):
    mesh = make_mesh(D)
    scene = quad_scene()
    params, config = quad_setup(width=WIDTH, height=HEIGHT, max_bounces=2,
                                use_area_light=use_area_light)

    state0 = wf_reset(config, NUM_TASKS)
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))

    # --- reference: run every shard's segments sequentially on one device
    local_pixels = config.num_pixels // D
    ref_films, ref_counters = [], []
    for k in range(D):
        st = _slice_state(state0, k, D)
        base = jnp.int32(k * local_pixels)
        for _ in range(3):
            st, cnt = step(scene, params, st, config, pixel_base=base)
        ref_films.append(st.film)
        ref_counters.append(cnt)

    # --- sharded run
    scene_r = replicate_scene(scene, mesh)
    st = shard_wf_state(state0, mesh)
    sstep = jax.jit(lambda sc, pr, s: wf_segment_sharded(sc, pr, s,
                                                         config, mesh))
    for _ in range(3):
        st, cnt = sstep(scene_r, params, st)

    got = np.asarray(st.film.color.x)
    want = np.concatenate([np.asarray(f.color.x) for f in ref_films])
    np.testing.assert_array_equal(got, want)
    got_w = np.asarray(st.film.weight)
    want_w = np.concatenate([np.asarray(f.weight) for f in ref_films])
    np.testing.assert_array_equal(got_w, want_w)

    # counters: psum over shards == sum of local counters (last segment)
    assert int(cnt.splatted) == sum(int(c.splatted) for c in ref_counters)
    assert int(cnt.raygen) == sum(int(c.raygen) for c in ref_counters)
    assert int(cnt.shadow) == sum(int(c.shadow) for c in ref_counters)


def test_sharded_wavefront_converges():
    """Statistical check: the sharded wavefront fills every pixel and
    matches the unsharded mean brightness on the quad scene."""
    mesh = make_mesh(D)
    scene = quad_scene()
    params, config = quad_setup(width=WIDTH, height=HEIGHT, max_bounces=2)

    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))
    st_u = wf_reset(config, NUM_TASKS)
    for _ in range(40):
        st_u, _ = step(scene, params, st_u, config)

    st_s = shard_wf_state(wf_reset(config, NUM_TASKS), mesh)
    scene_r = replicate_scene(scene, mesh)
    sstep = jax.jit(lambda sc, pr, s: wf_segment_sharded(sc, pr, s,
                                                         config, mesh))
    for _ in range(40):
        st_s, _ = sstep(scene_r, params, st_s)

    w_u = np.asarray(st_u.film.weight)
    w_s = np.asarray(st_s.film.weight)
    assert (w_s > 0).all(), "some pixels never splatted under sharding"
    mean_u = (np.asarray(st_u.film.color.x).sum() / w_u.sum())
    mean_s = (np.asarray(st_s.film.color.x).sum() / w_s.sum())
    assert abs(mean_u - mean_s) / max(mean_u, 1e-9) < 0.05


def test_sharded_equals_local_mxu_block():
    """Bit-exactness on the PRODUCTION TPU configuration (round-3 verdict
    weak #5): MXU cluster-table trace + winner resolve (interpret mode) +
    the block-bound pool's dense per-group splat, sharded over 8 virtual
    devices vs the same per-shard segments run sequentially on one device.
    curr_pixel is a per-GROUP cursor vector here — each shard owns whole
    groups (parallel/mesh.py block-mode sharding)."""
    from fluctus_tpu.testing import mxu_block_scene

    d = 8
    num_tasks = 2048
    scene, params, config = mxu_block_scene(num_tasks=num_tasks)
    assert config.block_ring and scene.mxu is not None
    mesh = make_mesh(d)
    state0 = wf_reset(config, num_tasks,
                      world_radius=float(params.world_radius))
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))

    # block mode: film/spp live in the padded [G*Pk] layout and curr_pixel
    # is [G]; a shard owns G/d whole groups
    g = config.groups
    segs = 5
    ref_films, ref_spps, ref_counters = [], [], []
    local_pixels = state0.film.weight.shape[0] // d
    for k in range(d):
        n = num_tasks // d
        pool = jax.tree_util.tree_map(
            lambda a: a[k * n:(k + 1) * n], state0.pool)
        film = jax.tree_util.tree_map(
            lambda a: a[k * local_pixels:(k + 1) * local_pixels], state0.film)
        st = WfState(pool=pool, film=film,
                     spp=state0.spp[k * local_pixels:(k + 1) * local_pixels],
                     curr_pixel=state0.curr_pixel[k * g // d:(k + 1) * g // d])
        base = jnp.int32(k * local_pixels)
        for _ in range(segs):
            st, cnt = step(scene, params, st, config, pixel_base=base)
        ref_films.append(st.film)
        ref_spps.append(st.spp)
        ref_counters.append(cnt)

    scene_r = replicate_scene(scene, mesh)
    st = shard_wf_state(state0, mesh)
    sstep = jax.jit(lambda sc, pr, s: wf_segment_sharded(sc, pr, s,
                                                         config, mesh))
    for _ in range(segs):
        st, cnt = sstep(scene_r, params, st)

    for ch in ("x", "y", "z"):
        got = np.asarray(getattr(st.film.color, ch))
        want = np.concatenate(
            [np.asarray(getattr(f.color, ch)) for f in ref_films])
        np.testing.assert_array_equal(got, want)
    got_w = np.asarray(st.film.weight)
    want_w = np.concatenate([np.asarray(f.weight) for f in ref_films])
    np.testing.assert_array_equal(got_w, want_w)
    assert got_w.sum() > 0, "block splat never fired under sharding"
    np.testing.assert_array_equal(
        np.asarray(st.spp), np.concatenate([np.asarray(s) for s in ref_spps]))
    assert int(cnt.splatted) == sum(int(c.splatted) for c in ref_counters)
    assert int(cnt.shadow) == sum(int(c.shadow) for c in ref_counters)
    assert int(cnt.raygen) == sum(int(c.raygen) for c in ref_counters)


def test_sharded_equals_local_egyptcat():
    """Bit-exactness on the REAL scene path (round-3 verdict #4): the full
    egyptcat DeviceScene pytree — 16k-tri BVH, GGX + texture atlas, env
    radiance/pdf/alias tables — sharded over 8 virtual devices, vs the
    same per-shard segments run sequentially on one device."""
    from fluctus_tpu.testing import egyptcat_scene

    d = 8
    num_tasks = 128 * d
    scene, params, config = egyptcat_scene(width=8 * d, height=8,
                                           max_bounces=3)
    mesh = make_mesh(d)
    state0 = wf_reset(config, num_tasks,
                      world_radius=float(params.world_radius))
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))

    # a full sample at max_bounces=3 takes 4 segments (birth + 3 bounces);
    # run 5 so terminations have splatted
    segs = 5
    local_pixels = config.num_pixels // d
    ref_films, ref_counters = [], []
    for k in range(d):
        st = _slice_state(state0, k, d)
        base = jnp.int32(k * local_pixels)
        for _ in range(segs):
            st, cnt = step(scene, params, st, config, pixel_base=base)
        ref_films.append(st.film)
        ref_counters.append(cnt)

    scene_r = replicate_scene(scene, mesh)
    st = shard_wf_state(state0, mesh)
    sstep = jax.jit(lambda sc, pr, s: wf_segment_sharded(sc, pr, s,
                                                         config, mesh))
    for _ in range(segs):
        st, cnt = sstep(scene_r, params, st)

    for ch in ("x", "y", "z"):
        got = np.asarray(getattr(st.film.color, ch))
        want = np.concatenate(
            [np.asarray(getattr(f.color, ch)) for f in ref_films])
        np.testing.assert_array_equal(got, want)
    got_w = np.asarray(st.film.weight)
    want_w = np.concatenate([np.asarray(f.weight) for f in ref_films])
    np.testing.assert_array_equal(got_w, want_w)
    assert got_w.sum() > 0
    assert int(cnt.splatted) == sum(int(c.splatted) for c in ref_counters)
    assert int(cnt.shadow) == sum(int(c.shadow) for c in ref_counters)
