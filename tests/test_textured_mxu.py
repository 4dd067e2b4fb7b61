"""Texture overlay on the MXU shading path (interpret mode) must match the
gather-based resolve_material path."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fluctus_tpu.accel import build_bvh
from fluctus_tpu.accel.mxu_trace import MXUScene
from fluctus_tpu.bsdf import apply_textures, resolve_material
from fluctus_tpu.core.trace import DeviceScene, trace_extension
from fluctus_tpu.accel.traverse import BVHDevice, TrianglesDevice
from fluctus_tpu.scene.material import default_material, materials_to_soa
from fluctus_tpu.scene.texture import HostTexture, pack_atlas
from fluctus_tpu import bxdf_types as bx
from fluctus_tpu.vec import Vec3


class _FakeTex(HostTexture):
    def __init__(self, data, name):
        self.data = data
        self.name = name
        self.height, self.width = data.shape[:2]


def test_mxu_textured_shading_matches_gather_path():
    # checkerboard texture
    check = np.zeros((8, 8, 4), np.uint8)
    check[::2, ::2] = (255, 0, 0, 255)
    check[1::2, 1::2] = (255, 0, 0, 255)
    check[check[..., 3] == 0] = (0, 255, 0, 255)
    tex = _FakeTex(check, "check")
    atlas = pack_atlas([tex])

    size = 10.0
    p = np.array([
        [[-size, -size, 0.0], [size, -size, 0.0], [size, size, 0.0]],
        [[-size, -size, 0.0], [size, size, 0.0], [-size, size, 0.0]],
    ], np.float32)
    n = np.zeros_like(p)
    n[..., 2] = 1.0
    uv = np.array([
        [[0, 0], [4, 0], [4, 4]],
        [[0, 0], [4, 4], [0, 4]],
    ], np.float32)
    mat = default_material()
    mat.map_Kd = 0
    mats = [mat]
    mxu = MXUScene.build(p, build_bvh(p), cluster_size=128, normals=n,
                         uvs=uv, mat_ids=np.zeros(2, np.int32),
                         materials=mats)
    scene = DeviceScene(
        tris=TrianglesDevice.from_arrays(p, n, uv, np.zeros(2, np.int32)),
        bvh=BVHDevice.from_host(build_bvh(p)),
        mats=materials_to_soa(mats), atlas=atlas, env=None,
        material_types=bx.BXDF_DIFFUSE, mxu=mxu)

    # rays hitting the quad at random points
    rng = np.random.default_rng(3)
    o = np.stack([rng.uniform(-9, 9, 128), rng.uniform(-9, 9, 128),
                  np.full(128, 5.0)], 1)
    ov = Vec3(*[jnp.asarray(o[:, i], jnp.float32) for i in range(3)])
    dv = Vec3(jnp.zeros(128), jnp.zeros(128), jnp.full(128, -1.0))

    hit, sp = trace_extension(ov, dv, scene, None, jnp.asarray(False),
                              want_shading=True)
    assert sp is not None
    sp_tex = apply_textures(sp, hit.uv_u, hit.uv_v, scene.atlas)

    ref = resolve_material(scene.mats, hit.mat_id, hit.uv_u, hit.uv_v,
                           scene.atlas)
    hitm = np.asarray(hit.i) >= 0
    assert hitm.all()
    np.testing.assert_allclose(np.asarray(sp_tex.Kd.x)[hitm],
                               np.asarray(ref.Kd.x)[hitm], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp_tex.Kd.y)[hitm],
                               np.asarray(ref.Kd.y)[hitm], atol=1e-5)
    # sanity: the checker actually produces both colors
    reds = np.asarray(sp_tex.Kd.x)[hitm] > 0.5
    assert 0.2 < reds.mean() < 0.8
