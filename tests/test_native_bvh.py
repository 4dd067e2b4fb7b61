import time

import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel.traverse import (BVHDevice, TrianglesDevice,
                                        brute_force_closest, closest_hit)
from fluctus_tpu.native import build_bvh_native
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3


@pytest.fixture(scope="module")
def teapot():
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    return s.triangle_arrays()


def test_native_builds_and_traverses(teapot):
    p, n, t, m = teapot
    bvh = build_bvh_native(p)
    if bvh is None:
        pytest.skip("no native toolchain")
    assert bvh.num_nodes > 100
    assert bvh.max_leaf_size() <= 8
    assert sorted(bvh.indices.tolist()) == list(range(p.shape[0]))
    inner = bvh.n_prims == 0
    inner_ids = np.nonzero(inner)[0]
    assert (bvh.parent[inner_ids + 1] == inner_ids).all()
    assert (bvh.parent[bvh.right_or_start[inner]] == inner_ids).all()

    # traversal against brute force
    dev = BVHDevice.from_host(bvh)
    tris = TrianglesDevice.from_arrays(p, n, t, m)
    rng = np.random.default_rng(11)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    o = c + rng.standard_normal((256, 3)) * np.linalg.norm(hi - lo)
    tg = lo + rng.random((256, 3)) * (hi - lo)
    d = tg - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])
    t1, tri1, _, _ = closest_hit(ov, dv, tris, dev)
    t2, tri2, _, _ = brute_force_closest(ov, dv, tris)
    np.testing.assert_array_equal(np.asarray(tri1) >= 0,
                                  np.asarray(tri2) >= 0)
    hits = np.asarray(tri2) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hits], np.asarray(t2)[hits],
                               rtol=1e-5)


def test_native_matches_python_quality(teapot):
    """Same split algorithm -> nearly identical tree cost."""
    p, _, _, _ = teapot
    nat = build_bvh_native(p)
    if nat is None:
        pytest.skip("no native toolchain")
    py = build_bvh(p)
    # surface-area heuristic cost proxy: sum of leaf areas * prims
    def sah(b):
        leaf = b.n_prims > 0
        from fluctus_tpu.accel.bvh import _aabb_area
        return float((_aabb_area(b.box_min[leaf], b.box_max[leaf])
                      * b.n_prims[leaf]).sum())
    assert abs(sah(nat) - sah(py)) / sah(py) < 0.05
    assert abs(nat.num_nodes - py.num_nodes) / py.num_nodes < 0.05
