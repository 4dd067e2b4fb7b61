"""Exact-spp termination with the block-bound pool (CHECK_SPP semantics,
wf_logic.cl:76-84 / mk_splat.cl:21-34, enforced in-kernel by
core/block_splat.py's capped multi-admit): every pixel must stop at
EXACTLY max_spp, and the deep tail must converge budget-many samples per
segment — not one (round-3 verdict weak #6)."""

import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu.core.integrator_wf import (unpad_pixels, wf_reset,
                                            wf_segment)
from fluctus_tpu.testing import quad_scene, quad_setup


def _run_exact(config, num_tasks, scene, params, max_segments=64):
    state = wf_reset(config, num_tasks)
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))
    for seg in range(1, max_segments + 1):
        state, _ = step(scene, params, state, config)
        spp = np.asarray(unpad_pixels(state.spp, config))
        if spp.min() >= config.max_spp:
            return state, seg
    raise AssertionError(
        f"exact render did not converge in {max_segments} segments "
        f"(min spp {spp.min()}/{config.max_spp})")


def test_block_exact_spp_terminates_exactly():
    scene = quad_scene()
    spp_cap = 4
    # heavily over-subscribed: 128 lanes/group vs 16 true pixels/group at
    # 4 spp = 64 budget — most segments the candidates exceed the budget,
    # so the multi-admit path (not the all-fits fast case) is exercised
    params, config = quad_setup(width=8, height=8, max_bounces=2,
                                block_ring=True, groups=4, backend="jax",
                                max_spp=spp_cap)
    params = params._replace(max_spp=jnp.int32(spp_cap))
    state, segs_block = _run_exact(config, num_tasks=512, scene=scene,
                                   params=params)

    spp = np.asarray(unpad_pixels(state.spp, config))
    w = np.asarray(unpad_pixels(state.film.weight, config))
    np.testing.assert_array_equal(spp, spp_cap)      # exact, never over
    np.testing.assert_array_equal(w, float(spp_cap))  # weight == spp
    # padded dead slots never got splats
    total_w = float(np.asarray(state.film.weight).sum())
    assert total_w == config.num_pixels * spp_cap

    # mean brightness matches the non-block exact path statistically
    img_block = np.asarray(unpad_pixels(state.film.color.x, config)) / w

    params2, config2 = quad_setup(width=8, height=8, max_bounces=2,
                                  max_spp=spp_cap)
    params2 = params2._replace(max_spp=jnp.int32(spp_cap))
    state2, _ = _run_exact(config2, num_tasks=512, scene=scene,
                           params=params2)
    spp2 = np.asarray(state2.spp)
    np.testing.assert_array_equal(spp2, spp_cap)
    img_flat = np.asarray(state2.film.color.x) / np.asarray(
        state2.film.weight)
    assert abs(img_block.mean() - img_flat.mean()) / img_flat.mean() < 0.08

    # multi-admit tail: with 128 candidates/segment/group and a budget of
    # 64, an exact render finishes in a handful of segments; the old
    # one-splat-per-pixel-per-segment cap needed >= spp_cap extra
    # segments per pixel once over budget
    assert segs_block <= 12, segs_block


def test_block_exact_spp_multi_admit_single_segment():
    """A single over-subscribed segment admits budget-many samples per
    pixel, not one: after segment k where terminations flood in, pixel
    spp can jump by >1 (the direct gate on the round-3 weak #6 fix)."""
    scene = quad_scene()
    spp_cap = 8
    params, config = quad_setup(width=8, height=8, max_bounces=1,
                                block_ring=True, groups=4, backend="jax",
                                max_spp=spp_cap)
    params = params._replace(max_spp=jnp.int32(spp_cap))
    state = wf_reset(config, 1024)      # 256 lanes/group, 16 px/group
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))
    jumped = 0
    prev = np.asarray(unpad_pixels(state.spp, config))
    for _ in range(12):
        state, _ = step(scene, params, state, config)
        cur = np.asarray(unpad_pixels(state.spp, config))
        jumped = max(jumped, int((cur - prev).max()))
        prev = cur
        if cur.min() >= spp_cap:
            break
    assert cur.min() == cur.max() == spp_cap
    assert jumped > 1, "per-segment admission serialized to one splat"
