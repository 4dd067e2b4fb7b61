"""Winner-resolve kernel: interpolated attributes must match the
gather-based reconstruction."""

import numpy as np
import jax.numpy as jnp

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel.mxu_trace import (MXUScene, closest_hit_mxu_full,
                                         resolve_hits_mxu)
from fluctus_tpu.accel.traverse import TrianglesDevice
from fluctus_tpu.core.trace import reconstruct_hit
from fluctus_tpu.scene import Scene
from fluctus_tpu.vec import Vec3, normalize


def test_resolve_matches_gather_reconstruction():
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    p, nrm, uv, mid = s.triangle_arrays()
    bvh = build_bvh(p)
    mxu = MXUScene.build(p, bvh, cluster_size=256, normals=nrm, uvs=uv,
                         mat_ids=mid)
    tris = TrianglesDevice.from_arrays(p, nrm, uv, mid)

    rng = np.random.default_rng(5)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    r = np.linalg.norm(hi - lo)
    o = c + rng.standard_normal((256, 3)) * r
    tg = lo + rng.random((256, 3)) * (hi - lo)
    d = tg - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])

    t, tri, u, v, col = closest_hit_mxu_full(ov, dv, mxu, ray_tile=256,
                                             interpret=True)
    from fluctus_tpu.accel import mxu_trace as mt
    row = resolve_hits_mxu(ov, dv, t, col, mxu, ray_tile=256, interpret=True)
    n2 = Vec3(row[mt.ATTR_N], row[mt.ATTR_N + 1], row[mt.ATTR_N + 2])
    uu, vv = row[mt.ATTR_UV], row[mt.ATTR_UV + 1]
    mat2 = jnp.where(col >= 0,
                     (row[mt.ATTR_MAT] + 0.5).astype(jnp.int32), -1)
    ref = reconstruct_hit(ov, dv, t, tri, u, v, tris)

    hitm = np.asarray(tri) >= 0
    assert hitm.sum() > 50
    n2n = normalize(n2)
    np.testing.assert_allclose(np.asarray(n2n.x)[hitm],
                               np.asarray(ref.N.x)[hitm], atol=5e-4)
    np.testing.assert_allclose(np.asarray(n2n.z)[hitm],
                               np.asarray(ref.N.z)[hitm], atol=5e-4)
    np.testing.assert_allclose(np.asarray(uu)[hitm],
                               np.asarray(ref.uv_u)[hitm], atol=5e-4)
    np.testing.assert_array_equal(np.asarray(mat2)[hitm],
                                  np.asarray(ref.mat_id)[hitm])
    assert (np.asarray(mat2)[~hitm] == -1).all()

def test_resolve_v5_matches_v1():
    """The bf16 B16-table rays-on-lanes resolve (SoA [ATTR_COLS, n]
    output) must agree with the f32 grid-sweep kernel (v1, the
    interpret-mode reference; v2 was pruned round 5): integer rows
    exactly, floats to the 16-bit split tolerance."""
    from fluctus_tpu.accel import mxu_trace as mt
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    p, nrm, uv, mid = s.triangle_arrays()
    bvh = build_bvh(p)
    mxu = MXUScene.build(p, bvh, cluster_size=256, normals=nrm, uvs=uv,
                         mat_ids=mid, materials=s.materials)
    assert mxu.attr_b16 is not None

    rng = np.random.default_rng(9)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    r = np.linalg.norm(hi - lo)
    o = c + rng.standard_normal((256, 3)) * r
    tg = lo + rng.random((256, 3)) * (hi - lo)
    d = tg - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])

    t, tri, u, v, col = closest_hit_mxu_full(ov, dv, mxu, ray_tile=256,
                                             interpret=True)
    n = col.shape[0]
    o4, d4, _ = mt._ray_inputs(ov, dv, mxu, None, 256)
    col2, _ = mt._pad_rays(col.reshape(n, 1), 256)
    t2, _ = mt._pad_rays(t.reshape(n, 1), 256)
    v2 = np.asarray(mt._resolve(col2, t2, o4, d4, mxu.txy_t, mxu.attrs,
                                (mxu.n_clusters, mxu.cluster_size), 256,
                                True))
    assert mxu.b16t is not None
    v5 = np.asarray(mt._resolve_v5(col2, o4, d4, mxu.b16t, mxu.t12b,
                                   (mxu.n_clusters, mxu.cluster_size), 256,
                                   True))
    for c_ in (mt.ATTR_MAT, mt.ATTR_TYPE, mt.ATTR_MAP_KD, mt.ATTR_MAP_KS,
               mt.ATTR_MAP_N, mt.ATTR_TRI):
        np.testing.assert_array_equal(np.rint(v5[c_]), np.rint(v2[:, c_]))
    for c_, w in ((mt.ATTR_N, 3), (mt.ATTR_UV, 2), (mt.ATTR_KD, 3),
                  (mt.ATTR_NS, 1), (mt.ATTR_HITT, 1)):
        np.testing.assert_allclose(v5[c_:c_ + w].T, v2[:, c_:c_ + w],
                                   rtol=2e-3, atol=2e-3)


def test_slim_build_trims_dead_tables():
    """slim mode (production at >64k tris) must keep only the tables the
    runtime can reach at scale: B16 resolve (b16t/t12b), supercluster
    trace (t12, boxes) — and drop attr_b16 / tx/ty/tz (and txy_t past the
    rol residency gate), which cost ~295 MB of HBM at 481k tris."""
    import numpy as np
    from fluctus_tpu.accel import build_bvh
    from fluctus_tpu.accel.mxu_trace import MXUScene
    from fluctus_tpu.scene import Scene
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    p, n, t, m = s.triangle_arrays()
    bvh = build_bvh(p)
    mxu = MXUScene.build(p, bvh, cluster_size=256, normals=n, uvs=t,
                         mat_ids=m, materials=s.materials, slim=True)
    assert mxu.attr_b16 is None and mxu.attrs is None
    assert mxu.tx is None and mxu.ty is None and mxu.tz is None
    assert mxu.b16t is not None and mxu.t12 is not None
    assert mxu.t12b is not None and mxu.cluster_box is not None
    # teapot's txy_t is under the rol residency gate -> kept
    assert mxu.txy_t is not None
    # sub/fine boxes fed the pruned rol3/rol4 generations -> never built
    assert mxu.fine_box is None and mxu.sub_box is None


def test_resolve_v5s_matches_v5():
    """The HBM-streamed resolve (_resolve_v5s — dispatched when the B16
    table exceeds the VMEM residency budget, i.e. the conference/kitchen
    -scale path) must produce exactly what the resident-table _resolve_v5
    produces: same tables, same math, only the staging differs."""
    from fluctus_tpu.accel import mxu_trace as mt
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    p, nrm, uv, mid = s.triangle_arrays()
    bvh = build_bvh(p)
    mxu = MXUScene.build(p, bvh, cluster_size=256, normals=nrm, uvs=uv,
                         mat_ids=mid, materials=s.materials)
    assert mxu.b16t is not None

    rng = np.random.default_rng(11)
    lo, hi = p.reshape(-1, 3).min(0), p.reshape(-1, 3).max(0)
    c = (lo + hi) / 2
    r = np.linalg.norm(hi - lo)
    o = c + rng.standard_normal((256, 3)) * r
    tg = lo + rng.random((256, 3)) * (hi - lo)
    d = tg - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    dv = Vec3(*[jnp.asarray(d[:, i], jnp.float32) for i in range(3)])

    t, tri, u, v, col = closest_hit_mxu_full(ov, dv, mxu, ray_tile=256,
                                             interpret=True)
    n = col.shape[0]
    o4, d4, _ = mt._ray_inputs(ov, dv, mxu, None, 256)
    col2, _ = mt._pad_rays(col.reshape(n, 1), 256)
    args = (col2, o4, d4, mxu.b16t, mxu.t12b,
            (mxu.n_clusters, mxu.cluster_size), 256, True)
    v5 = np.asarray(mt._resolve_v5(*args))
    v5s = np.asarray(mt._resolve_v5s(*args))
    np.testing.assert_array_equal(v5s, v5)
