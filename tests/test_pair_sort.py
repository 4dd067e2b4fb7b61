"""FLT_PAIR_SORT: the shared-order ext+shadow trace must return exactly
what the two independent sorted traces return (the sort order changes
tile composition, but every cull is conservative, so winners and
occlusion verdicts are identical)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel import mxu_trace as mt
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3


@pytest.fixture(scope="module")
def teapot():
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    p, n, t, m = s.triangle_arrays()
    bvh = build_bvh(p)
    return p, mt.MXUScene.build(p, bvh, cluster_size=256)


def _rays(p, count, seed):
    rng = np.random.default_rng(seed)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    r = np.linalg.norm(hi - lo)
    o = c + rng.standard_normal((count, 3)) * r * 0.5
    tg = lo + rng.random((count, 3)) * (hi - lo)
    d = tg - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)]),
            Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)]))


def test_pair_matches_independent_traces(teapot):
    p, mxu = teapot
    n = 640                                # non-multiple of the ray tile
    eo, ed = _rays(p, n, seed=1)
    so, sd = _rays(p, n, seed=2)
    # mixed shadow occupancy: ~1/3 dead lanes (tmax 0), rest bounded
    rng = np.random.default_rng(3)
    stm = jnp.asarray(
        np.where(rng.random(n) < 0.33, 0.0,
                 rng.random(n).astype(np.float32) * 50.0 + 0.1),
        jnp.float32)

    t_p, col_p, occ_p = mt.trace_pair_mxu(eo, ed, so, sd, stm, mxu,
                                          ray_tile=256, interpret=True)

    eo4, ed4, _ = mt._ray_inputs(eo, ed, mxu, None, 256)
    so4, sd4, stm_col = mt._ray_inputs(so, sd, mxu, stm, 256)
    t_r, col_r = mt._sorted_trace(eo4, ed4, None, mxu, False, 256, True)
    _, i_r = mt._sorted_trace(so4, sd4, stm_col, mxu, True, 256, True)

    np.testing.assert_array_equal(np.asarray(col_p), np.asarray(col_r[:n, 0]))
    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_r[:n, 0]))
    np.testing.assert_array_equal(np.asarray(occ_p),
                                  np.asarray(i_r[:n, 0]) >= 0)
    assert np.asarray(col_p).max() >= 0          # some hits
    assert 0 < np.asarray(occ_p).sum() < n       # some occluded, some not


def test_pair_wf_phase_dispatch(monkeypatch):
    """wf_trace_phase routes through trace_pair iff FLT_PAIR_SORT=1 (and
    the scene/key preconditions hold)."""
    from fluctus_tpu.core import integrator_wf as wf

    called = {}

    def fake_pair(*a, **k):
        called["pair"] = True
        return (None, None), None

    monkeypatch.setattr(wf, "trace_pair", fake_pair)
    monkeypatch.setenv("FLT_PAIR_SORT", "1")

    class FakeMXU:
        attrs = None
        attr_b16 = None
        b16t = object()

    class FakeScene:
        mxu = FakeMXU()

    class FakePool:
        orig = dir = shadow_orig = shadow_dir = None
        shadow_pending = jnp.ones(4, bool)
        shadow_len = jnp.ones(4, jnp.float32)

    class FakeCfg:
        backend = "mxu"
        use_area_light = False

    class FakeParams:
        area_light = None

    if not mt.SORT_RAYS:
        pytest.skip("FLT_SORT_RAYS=0")
    wf.wf_trace_phase(FakeScene(), FakePool(), FakeParams(), FakeCfg())
    assert called.get("pair")


@pytest.mark.parametrize("mode", ["gather", "gather1"])
def test_perm_gather_matches_sort(teapot, monkeypatch, mode):
    """FLT_PERM=gather (2-operand key sort + one stacked row-gather +
    inverse-permutation unsort) must return exactly what the payload-
    carry sort machinery returns: the permutation may differ on
    duplicate keys, but every cull is conservative, so winners / t /
    occlusion verdicts are identical (same invariant as the pair test
    above). Covers all three sites: ext 1-key sort, shadow 2-key sort,
    and the shared pair sort."""
    p, mxu = teapot
    n = 640
    eo, ed = _rays(p, n, seed=4)
    so, sd = _rays(p, n, seed=5)
    rng = np.random.default_rng(6)
    stm = jnp.asarray(
        np.where(rng.random(n) < 0.33, 0.0,
                 rng.random(n).astype(np.float32) * 50.0 + 0.1),
        jnp.float32)

    eo4, ed4, _ = mt._ray_inputs(eo, ed, mxu, None, 256)
    so4, sd4, stm_col = mt._ray_inputs(so, sd, mxu, stm, 256)

    # Baseline leg pins BOTH flags to the sort-carry machinery (the pair
    # path now defaults to gather, the single-set path to sort).
    monkeypatch.setenv("FLT_PERM", "sort")
    monkeypatch.setenv("FLT_PERM_SINGLE", "sort")
    t_e0, c_e0 = mt._sorted_trace(eo4, ed4, None, mxu, False, 256, True)
    _, i_s0 = mt._sorted_trace(so4, sd4, stm_col, mxu, True, 256, True)
    tp0, cp0, op0 = mt.trace_pair_mxu(eo, ed, so, sd, stm, mxu,
                                      ray_tile=256, interpret=True)

    monkeypatch.setenv("FLT_PERM", mode)
    monkeypatch.setenv("FLT_PERM_SINGLE", mode)
    t_e1, c_e1 = mt._sorted_trace(eo4, ed4, None, mxu, False, 256, True)
    _, i_s1 = mt._sorted_trace(so4, sd4, stm_col, mxu, True, 256, True)
    tp1, cp1, op1 = mt.trace_pair_mxu(eo, ed, so, sd, stm, mxu,
                                      ray_tile=256, interpret=True)

    np.testing.assert_array_equal(np.asarray(t_e0), np.asarray(t_e1))
    np.testing.assert_array_equal(np.asarray(c_e0), np.asarray(c_e1))
    np.testing.assert_array_equal(np.asarray(i_s0) >= 0,
                                  np.asarray(i_s1) >= 0)
    np.testing.assert_array_equal(np.asarray(tp0), np.asarray(tp1))
    np.testing.assert_array_equal(np.asarray(cp0), np.asarray(cp1))
    np.testing.assert_array_equal(np.asarray(op0), np.asarray(op1))
