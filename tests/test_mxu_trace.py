"""MXU tracer tests run in Pallas interpret mode on CPU and compare against
the bitstack traversal / brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel.mxu_trace import (MXUScene, any_hit_mxu,
                                         closest_hit_mxu)
from fluctus_tpu.accel.traverse import (BVHDevice, TrianglesDevice,
                                        brute_force_closest)
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3


@pytest.fixture(scope="module")
def teapot():
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    p, n, t, m = s.triangle_arrays()
    bvh = build_bvh(p)
    mxu = MXUScene.build(p, bvh, cluster_size=256)
    tris = TrianglesDevice.from_arrays(p, n, t, m)
    return p, mxu, tris


def _rays(p, count, seed=0):
    rng = np.random.default_rng(seed)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    r = np.linalg.norm(hi - lo)
    o = c + rng.standard_normal((count, 3)) * r
    tg = lo + rng.random((count, 3)) * (hi - lo)
    d = tg - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)]),
            Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)]))


def test_cluster_structure(teapot):
    p, mxu, _ = teapot
    # every triangle appears at least once in the map
    ids = np.asarray(mxu.tri_map)
    present = np.unique(ids[ids >= 0])
    assert len(present) == p.shape[0]
    assert mxu.n_clusters * mxu.cluster_size == len(ids)


def test_closest_matches_brute_force(teapot):
    p, mxu, tris = teapot
    o, d = _rays(p, 512)
    t_m, tri_m, u_m, v_m = closest_hit_mxu(o, d, mxu, ray_tile=256,
                                           interpret=True)
    t_b, tri_b, u_b, v_b = brute_force_closest(o, d, tris)
    hit_m = np.asarray(tri_m) >= 0
    hit_b = np.asarray(tri_b) >= 0
    assert (hit_m == hit_b).mean() > 0.998  # epsilon-edge cases only
    both = hit_m & hit_b
    np.testing.assert_allclose(np.asarray(t_m)[both], np.asarray(t_b)[both],
                               rtol=1e-4)
    same_tri = (np.asarray(tri_m)[both] == np.asarray(tri_b)[both])
    assert same_tri.mean() > 0.99
    # barycentrics agree where the same triangle was chosen
    sel = both.copy()
    sel[both] &= same_tri
    np.testing.assert_allclose(np.asarray(u_m)[sel], np.asarray(u_b)[sel],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_m)[sel], np.asarray(v_b)[sel],
                               atol=1e-3)


def test_any_hit(teapot):
    p, mxu, tris = teapot
    o, d = _rays(p, 512, seed=1)
    t_b, tri_b, _, _ = brute_force_closest(o, d, tris)
    occ = np.asarray(any_hit_mxu(o, d, jnp.float32(1e30), mxu, ray_tile=256,
                                 interpret=True))
    hit = np.asarray(tri_b) >= 0
    assert (occ == hit).mean() > 0.998
    # with max dist below the hit -> unoccluded
    occ2 = np.asarray(any_hit_mxu(o, d, np.asarray(t_b) * 0.5, mxu,
                                  ray_tile=256, interpret=True))
    assert not occ2[hit].any()


def test_t_max_limits_closest(teapot):
    p, mxu, tris = teapot
    o, d = _rays(p, 256, seed=2)
    t_b, tri_b, _, _ = brute_force_closest(o, d, tris)
    t_m, tri_m, _, _ = closest_hit_mxu(o, d, mxu, t_max=np.asarray(t_b) * 0.5,
                                       ray_tile=256, interpret=True)
    assert not (np.asarray(tri_m)[np.asarray(tri_b) >= 0] >= 0).any()


def test_rol_generations_parity(teapot):
    """The production rays-on-lanes trace (rol1 — the sole surviving
    generation after the round-5 sweep prune; rol2/rol3/rol4 were
    measured losers and deleted) matches brute force for closest AND
    any-hit in interpret mode."""
    gen = "rol1"
    from fluctus_tpu.accel import mxu_trace as mt
    p, mxu, tris = teapot
    n = 512
    o, d = _rays(p, n, seed=4)
    on = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
    dn = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)
    oc = on - np.asarray(mxu.center)
    o4 = jnp.asarray(np.concatenate([oc, np.ones((n, 1))], 1), jnp.float32)
    d4 = jnp.asarray(np.concatenate([dn, np.zeros((n, 1))], 1), jnp.float32)
    static = (mxu.n_clusters, mxu.cluster_size)

    def run(tmax, any_hit):
        return mt._trace_rol(o4, d4, tmax, mxu.t12, mxu.cluster_box,
                             static, any_hit, 256, True)

    tmax = jnp.full((n, 1), 3.4e38, jnp.float32)
    t_k, i_k = run(tmax, False)
    cols = np.asarray(i_k).reshape(-1)
    tri_k = np.where(cols >= 0, np.asarray(mxu.tri_map)[np.maximum(cols, 0)],
                     -1)
    t_b, tri_b, _, _ = brute_force_closest(o, d, tris)
    tri_b, t_b = np.asarray(tri_b), np.asarray(t_b)
    hit_k, hit_b = tri_k >= 0, tri_b >= 0
    assert (hit_k == hit_b).mean() > 0.998
    both = hit_k & hit_b
    assert (tri_k[both] == tri_b[both]).mean() > 0.99
    np.testing.assert_allclose(np.asarray(t_k).reshape(-1)[both], t_b[both],
                               rtol=2e-4)
    # any-hit: tmax just above the closest hit blocks; just below passes
    t_hi = np.where(hit_b, np.minimum(t_b, 1e30) * 1.01,
                    3.4e38).astype(np.float32)
    _, ia = run(jnp.asarray(t_hi)[:, None], True)
    blocked = np.asarray(ia).reshape(-1) >= 0
    assert (blocked == hit_b).mean() > 0.998
    t_lo = np.where(hit_b, t_b * 0.5, 3.4e38).astype(np.float32)
    _, ia2 = run(jnp.asarray(t_lo)[:, None], True)
    assert not (np.asarray(ia2).reshape(-1)[hit_b] >= 0).any()


def test_closest_hit_without_txyt(teapot):
    """Slim tables (>64k tris production) drop txy_t, the exact-t debug
    recovery input — closest_hit_mxu must still return the same winners,
    with the kernel's packed t close to the exact one (the resolve row
    carries the exact f32 t at scale; check_sc_parity.py --big path)."""
    import dataclasses
    p, mxu, tris = teapot
    o, d = _rays(p, 256, seed=7)
    t0, tri0, u0, v0 = closest_hit_mxu(o, d, mxu, ray_tile=256,
                                       interpret=True)
    slim = dataclasses.replace(mxu, txy_t=None)
    t1, tri1, u1, v1 = closest_hit_mxu(o, d, slim, ray_tile=256,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    hit = np.asarray(tri0) >= 0
    rel = (np.abs(np.asarray(t1) - np.asarray(t0))[hit]
           / np.maximum(np.asarray(t0)[hit], 1e-6))
    assert rel.max() < 1e-2, "packed kernel t strayed from the exact t"


def test_tile_order_v1_v2_same_winners(teapot, monkeypatch):
    """_tile_order_v2 (exact per-ray slab union, the production default)
    and the interval-arithmetic _tile_order build different candidate
    lists but both are conservative — final winners must be identical."""
    p, mxu, tris = teapot
    o, d = _rays(p, 512, seed=5)
    outs = []
    for v in ("2", "1"):
        monkeypatch.setenv("FLT_TILE_ORDER", v)
        t, tri, u, vv, = closest_hit_mxu(o, d, mxu, ray_tile=256,
                                         interpret=True)
        outs.append((np.asarray(t), np.asarray(tri)))
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
