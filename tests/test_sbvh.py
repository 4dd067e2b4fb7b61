import numpy as np
import jax.numpy as jnp

from fluctus_tpu.accel.sbvh import build_sbvh
from fluctus_tpu.accel import export_bvh, import_bvh
from fluctus_tpu.accel.traverse import (
    BVHDevice, TrianglesDevice, brute_force_closest, closest_hit)
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3


def _load_teapot():
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    return s.triangle_arrays()


def test_sbvh_build():
    p, n, t, m = _load_teapot()
    bvh = build_sbvh(p)
    assert bvh.num_nodes > 100
    assert bvh.depth() <= 64
    # every triangle is referenced at least once; duplicates allowed
    referenced = np.unique(bvh.indices)
    assert len(referenced) == p.shape[0]
    assert len(bvh.indices) >= p.shape[0]
    # structure consistency
    inner = bvh.n_prims == 0
    inner_ids = np.nonzero(inner)[0]
    right = bvh.right_or_start[inner]
    assert (bvh.parent[inner_ids + 1] == inner_ids).all()
    assert (bvh.parent[right] == inner_ids).all()
    # leaf ranges in bounds
    leaves = bvh.n_prims > 0
    ends = bvh.right_or_start[leaves] + bvh.n_prims[leaves]
    assert ends.max() <= len(bvh.indices)


def test_sbvh_traversal_correct():
    p, n, t, m = _load_teapot()
    bvh = build_sbvh(p)
    dev = BVHDevice.from_host(bvh)
    tris = TrianglesDevice.from_arrays(p, n, t, m)

    rng = np.random.default_rng(3)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    center = (lo + hi) / 2
    radius = np.linalg.norm(hi - lo)
    o = center + rng.standard_normal((256, 3)) * radius
    tgt = lo + rng.random((256, 3)) * (hi - lo)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])

    t_b, tri_b, _, _ = closest_hit(ov, dv, tris, dev)
    t_r, tri_r, _, _ = brute_force_closest(ov, dv, tris)
    np.testing.assert_array_equal(np.asarray(tri_b) >= 0,
                                  np.asarray(tri_r) >= 0)
    hits = np.asarray(tri_r) >= 0
    np.testing.assert_allclose(np.asarray(t_b)[hits], np.asarray(t_r)[hits],
                               rtol=1e-5)


def test_sbvh_cache_roundtrip(tmp_path):
    p, n, t, m = _load_teapot()
    bvh = build_sbvh(p)
    path = str(tmp_path / "sbvh.bin")
    export_bvh(bvh, path)
    back = import_bvh(path)
    np.testing.assert_array_equal(back.indices, bvh.indices)
    np.testing.assert_array_equal(back.right_or_start, bvh.right_or_start)
