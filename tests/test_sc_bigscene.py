"""Supercluster-tier correctness at conference scale (320k tris), runnable
on CPU: the interpret-mode sc kernel must match the pure-JAX bitstack
traversal (accel/traverse.py, the bvh.cl:12-230 re-design) exactly.
This is the only CI-runnable correctness evidence for the large-scene
path (the TPU parity tool tools/check_sc_parity.py needs real hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.accel import mxu_trace as mt
from fluctus_tpu.accel.traverse import (BVHDevice, TrianglesDevice,
                                        closest_hit)
from fluctus_tpu.native import build_bvh_native
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3


@pytest.fixture(scope="module")
def bigscene():
    s = Scene()
    s.load_model("data/bigscene/big_egyptcat_5x4.sc.json")
    p, n, t, m = s.triangle_arrays()
    bvh = build_bvh_native(p)
    mxu = mt.MXUScene.build(p, bvh, cluster_size=256, slim=True)
    return p, n, t, m, bvh, mxu


def test_supercluster_parity_320k(bigscene):
    p, n, t, m, bvh, mxu = bigscene
    assert p.shape[0] > 300_000 and mxu.n_superclusters > 1
    rng = np.random.default_rng(1)
    cnt = 512
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    o = (lo + hi) / 2 + rng.standard_normal((cnt, 3)) \
        * 0.4 * np.linalg.norm(hi - lo)
    d = lo + rng.random((cnt, 3)) * (hi - lo) - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oc = o - np.asarray(mxu.center)
    o4 = jnp.asarray(np.concatenate([oc, np.ones((cnt, 1))], 1), jnp.float32)
    d4 = jnp.asarray(np.concatenate([d, np.zeros((cnt, 1))], 1), jnp.float32)
    tm = jnp.full((cnt, 1), 3.4e38, jnp.float32)
    t_sc, i_sc = mt._trace_rol_sc(o4, d4, tm, mxu.t12, mxu.cluster_box,
                                  mxu.sc_box,
                                  (mxu.n_superclusters, mxu.cluster_size),
                                  False, 512, True)
    cols = np.asarray(i_sc).reshape(-1)
    tri_sc = np.where(cols >= 0,
                      np.asarray(mxu.tri_map)[np.maximum(cols, 0)], -1)
    t_b, tri_b, _, _ = closest_hit(
        Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)]),
        Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)]),
        TrianglesDevice.from_arrays(p, n, t, m), BVHDevice.from_host(bvh))
    tri_b, t_b = np.asarray(tri_b), np.asarray(t_b)
    hit_sc, hit_b = tri_sc >= 0, tri_b >= 0
    assert (hit_sc == hit_b).mean() > 0.998
    both = hit_sc & hit_b
    assert (tri_sc[both] == tri_b[both]).mean() > 0.995
    terr = np.abs(np.asarray(t_sc).reshape(-1)[both] - t_b[both]) \
        / np.maximum(t_b[both], 1e-6)
    assert terr.max() < 1e-3
