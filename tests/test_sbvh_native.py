"""Native (C++) SBVH builder: equivalence with the python builder on a
small mesh, structural validity + build-time bound at >=100k triangles
(sbvh.cpp:108-453 semantics; the native port exists because numpy recursion
is minutes at country_kitchen scale)."""

import numpy as np
import pytest

from fluctus_tpu.accel.sbvh import build_sbvh
from fluctus_tpu.native import build_sbvh_native


def _tri_soup(m, seed=0, clustered=True):
    """Random triangle soup; clustered centers give SBVH-relevant overlap."""
    rng = np.random.default_rng(seed)
    if clustered:
        k = max(m // 64, 1)
        centers = rng.uniform(-10, 10, (k, 3))
        c = centers[rng.integers(0, k, m)]
        c = c + rng.normal(0, 0.8, (m, 3))
    else:
        c = rng.uniform(-10, 10, (m, 3))
    v = rng.normal(0, 0.35, (m, 3, 3))
    return (c[:, None, :] + v).astype(np.float32)


def _validate(bvh, m):
    covered = np.zeros(m, bool)
    inner = bvh.n_prims == 0
    leafs = ~inner
    starts = bvh.right_or_start[leafs].astype(np.int64)
    for s, k in zip(starts, bvh.n_prims[leafs]):
        covered[bvh.indices[s:s + k]] = True
    assert covered.all()
    # children containment + parent links (vectorized)
    idx = np.nonzero(inner)[0]
    left = idx + 1
    right = bvh.right_or_start[idx].astype(np.int64)
    for ch in (left, right):
        assert (bvh.box_min[idx] <= bvh.box_min[ch] + 1e-4).all()
        assert (bvh.box_max[idx] >= bvh.box_max[ch] - 1e-4).all()
        assert (bvh.parent[ch] == idx).all()


def _sah_cost(bvh):
    ext = np.clip(bvh.box_max - bvh.box_min, 0, None)
    area = 2 * (ext[:, 0] * ext[:, 1] + ext[:, 0] * ext[:, 2]
                + ext[:, 1] * ext[:, 2])
    leaf = bvh.n_prims > 0
    return (area[~leaf].sum()
            + (area[leaf] * bvh.n_prims[leaf]).sum()) / max(area[0], 1e-30)


def test_native_matches_python_small():
    p = _tri_soup(700, seed=3)
    py = build_sbvh(p)
    nat = build_sbvh_native(p, verbose=False)
    assert nat is not None, "native toolchain unavailable"
    _validate(py, 700)
    _validate(nat, 700)
    # same algorithm, same double-precision math -> identical structure
    assert len(nat.n_prims) == len(py.n_prims)
    assert len(nat.indices) == len(py.indices)
    np.testing.assert_allclose(_sah_cost(nat), _sah_cost(py), rtol=1e-6)


def test_native_large_scene():
    import time
    m = 120_000
    p = _tri_soup(m, seed=11)
    t0 = time.time()
    bvh = build_sbvh_native(p, verbose=False)
    dt = time.time() - t0
    assert bvh is not None
    _validate(bvh, m)
    assert dt < 30.0, f"native SBVH build took {dt:.1f}s at 120k tris"
    # random soup is overlap-pathological; real meshes run ~3-35% dup
    # (teapot 3.5%, gold_rings 7.3%) — bound the soup's blowup loosely
    assert len(bvh.indices) < 3.0 * m
