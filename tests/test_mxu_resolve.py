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
    n2 = Vec3(row[:, mt.ATTR_N], row[:, mt.ATTR_N + 1], row[:, mt.ATTR_N + 2])
    uu, vv = row[:, mt.ATTR_UV], row[:, mt.ATTR_UV + 1]
    mat2 = jnp.where(col >= 0,
                     (row[:, mt.ATTR_MAT] + 0.5).astype(jnp.int32), -1)
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
