import os

import numpy as np
import jax.numpy as jnp

from fluctus_tpu.accel import build_bvh, export_bvh, import_bvh, SplitMode
from fluctus_tpu.accel.traverse import (
    BVHDevice, TrianglesDevice, any_hit, brute_force_closest, closest_hit)
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3


def _load(path):
    s = Scene()
    s.load_model(path)
    p, n, t, m = s.triangle_arrays()
    return p, n, t, m


def _random_rays(n, lo, hi, rng):
    center = (lo + hi) / 2
    radius = np.linalg.norm(hi - lo) * 0.7
    # origins on a sphere around the scene, directions toward random interior points
    o = rng.standard_normal((n, 3))
    o = center + radius * o / np.linalg.norm(o, axis=1, keepdims=True)
    target = lo + rng.random((n, 3)) * (hi - lo)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3.of(o[:, 0], o[:, 1], o[:, 2]),
            Vec3.of(d[:, 0], d[:, 1], d[:, 2]))


def test_bvh_build_teapot():
    p, n, t, m = _load("/root/reference/assets/teapot.ply")
    bvh = build_bvh(p)
    assert bvh.num_nodes > 100
    assert bvh.max_leaf_size() <= 8
    assert bvh.depth() <= 64
    # all triangles present in index list exactly once (no spatial splits)
    assert sorted(bvh.indices.tolist()) == list(range(p.shape[0]))
    # parent pointers consistent: children reference their parent
    inner = bvh.n_prims == 0
    right = bvh.right_or_start[inner]
    inner_ids = np.nonzero(inner)[0]
    assert (bvh.parent[inner_ids + 1] == inner_ids).all()
    assert (bvh.parent[right] == inner_ids).all()


def test_traversal_matches_brute_force():
    p, n, t, m = _load("/root/reference/assets/teapot.ply")
    bvh = build_bvh(p)
    dev_bvh = BVHDevice.from_host(bvh)
    tris = TrianglesDevice.from_arrays(p, n, t, m)

    rng = np.random.default_rng(42)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    o, d = _random_rays(512, lo, hi, rng)

    t_bvh, tri_bvh, u_bvh, v_bvh = closest_hit(o, d, tris, dev_bvh)
    t_bf, tri_bf, u_bf, v_bf = brute_force_closest(o, d, tris)

    t_bvh, t_bf = np.asarray(t_bvh), np.asarray(t_bf)
    tri_bvh, tri_bf = np.asarray(tri_bvh), np.asarray(tri_bf)

    hit_rate = (tri_bf >= 0).mean()
    assert hit_rate > 0.5  # rays actually exercise the scene

    # same hit/miss classification
    np.testing.assert_array_equal(tri_bvh >= 0, tri_bf >= 0)
    # same distance (identical math: bitwise equal up to assoc differences)
    hits = tri_bf >= 0
    np.testing.assert_allclose(t_bvh[hits], t_bf[hits], rtol=1e-5)
    # same triangle except exact ties
    same = tri_bvh == tri_bf
    assert same[hits].mean() > 0.99


def test_any_hit():
    p, n, t, m = _load("/root/reference/assets/teapot.ply")
    bvh = build_bvh(p)
    dev_bvh = BVHDevice.from_host(bvh)
    tris = TrianglesDevice.from_arrays(p, n, t, m)

    rng = np.random.default_rng(7)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    o, d = _random_rays(512, lo, hi, rng)

    t_bf, tri_bf, _, _ = brute_force_closest(o, d, tris)
    occ_far = np.asarray(any_hit(o, d, jnp.float32(1e30), tris, dev_bvh))
    np.testing.assert_array_equal(occ_far, np.asarray(tri_bf) >= 0)

    # shortened max dist: anything closer than t_hit*0.5 must be unoccluded
    occ_near = np.asarray(any_hit(o, d, np.asarray(t_bf) * 0.5, tris, dev_bvh))
    assert not occ_near[np.asarray(tri_bf) >= 0].any()


def test_bvh_cache_roundtrip(tmp_path):
    p, n, t, m = _load("/root/reference/assets/teapot.ply")
    bvh = build_bvh(p)
    path = str(tmp_path / "h.bin")
    export_bvh(bvh, path)
    back = import_bvh(path)
    np.testing.assert_array_equal(back.indices, bvh.indices)
    assert back.num_nodes == bvh.num_nodes
    np.testing.assert_allclose(back.box_min, bvh.box_min)
    np.testing.assert_allclose(back.box_max, bvh.box_max)
    np.testing.assert_array_equal(back.right_or_start, bvh.right_or_start)
    np.testing.assert_array_equal(back.parent, bvh.parent)
    np.testing.assert_array_equal(back.n_prims, bvh.n_prims)


def test_object_median_mode():
    p, n, t, m = _load("/root/reference/assets/teapot.ply")
    bvh = build_bvh(p, mode=SplitMode.OBJECT_MEDIAN)
    assert sorted(bvh.indices.tolist()) == list(range(p.shape[0]))
