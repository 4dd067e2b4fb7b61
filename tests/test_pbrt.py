import numpy as np
import pytest

from fluctus_tpu import bxdf_types as bx
from fluctus_tpu.scene import Scene

PBRT_SCENE = """
LookAt 0 2 8   0 1 0   0 1 0
Camera "perspective" "float fov" [45]
Film "image" "integer xresolution" [64] "integer yresolution" [64]

WorldBegin

MakeNamedMaterial "redmatte" "string type" "matte" "rgb Kd" [0.8 0.1 0.1]

AttributeBegin
  Material "glass" "float index" [1.6]
  Translate 0 1 0
  Shape "trianglemesh"
    "point P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    "integer indices" [0 1 2  0 2 3]
AttributeEnd

AttributeBegin
  NamedMaterial "redmatte"
  Scale 5 1 5
  Shape "trianglemesh"
    "point P" [-1 0 -1  1 0 -1  1 0 1  -1 0 1]
    "normal N" [0 1 0  0 1 0  0 1 0  0 1 0]
    "float uv" [0 0  1 0  1 1  0 1]
    "integer indices" [0 1 2  0 2 3]
AttributeEnd

AttributeBegin
  Material "metal" "float roughness" [0.05]
  Shape "trianglemesh"
    "point P" [-1 2 -1  1 2 -1  0 3 0]
    "integer indices" [0 1 2]
AttributeEnd

WorldEnd
"""


def test_pbrt_parse(tmp_path):
    path = tmp_path / "test.pbrt"
    path.write_text(PBRT_SCENE)
    s = Scene()
    s.load_model(str(path))
    assert s.num_triangles == 5
    p, n, t, m = s.triangle_arrays()
    # glass quad translated to y=1
    assert abs(p[0][:, 1].mean() - 1.0) < 1e-5
    # ground quad scaled by 5 in x/z
    ground = p[2:4].reshape(-1, 3)
    assert abs(ground[:, 0]).max() == pytest.approx(5.0)
    # materials: default + redmatte + glass + metal
    types = [mat.type for mat in s.materials]
    assert bx.BXDF_IDEAL_DIELECTRIC in types
    assert bx.BXDF_GGX_ROUGH_REFLECTION in types
    red = [mat for mat in s.materials if mat.name == "matte"]
    assert red and red[0].Kd == (0.8, 0.1, 0.1)
    glass = [mat for mat in s.materials
             if mat.type == bx.BXDF_IDEAL_DIELECTRIC][0]
    assert glass.Ni == pytest.approx(1.6)
    # camera imported
    assert s.camera_override is not None
    assert s.camera_override.fov == 45.0
    np.testing.assert_allclose(s.camera_override.pos, (0, 2, 8), atol=1e-5)
    d = np.asarray(s.camera_override.dir)
    d = d / np.linalg.norm(d)
    expect = np.array([0, -1, -8.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(d, expect, atol=1e-5)
    # normals transformed/unit
    ln = np.linalg.norm(n.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-4)
    # uv carried for the ground quad
    assert t[2:4].max() == 1.0


def test_pbrt_render_smoke(tmp_path):
    path = tmp_path / "r.pbrt"
    path.write_text(PBRT_SCENE)
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 3
    r = Renderer(32, 32, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene(str(path),
                 env_map="/root/reference/assets/env_maps/night.hdr")
    # camera_override should drive params
    r.render_single(spp=2)
    img = r.hdr_image()
    assert np.isfinite(img).all()


def test_pbrt_binary_cache(tmp_path):
    """Second load of a .pbrt comes from the .flc.npz parse cache
    (role of .pbf, scene.cpp:486-519) and reproduces the parse exactly;
    editing the source invalidates it."""
    from fluctus_tpu.scene import pbrt_cache

    path = tmp_path / "c.pbrt"
    path.write_text(PBRT_SCENE)
    s1 = Scene()
    s1.load_model(str(path))
    cache = pbrt_cache.cache_path(str(path))
    import os
    assert os.path.exists(cache)

    s2 = Scene()
    s2.load_model(str(path))          # cache hit
    a1, a2 = s1.triangle_arrays(), s2.triangle_arrays()
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x, y)
    assert [m.type for m in s1.materials] == [m.type for m in s2.materials]
    assert [m.Kd for m in s1.materials] == [m.Kd for m in s2.materials]
    assert s2.camera_override is not None
    assert s2.camera_override.fov == s1.camera_override.fov
    assert s2.material_types == s1.material_types
    assert s2.hash == s1.hash

    # stale cache: source changed -> re-parse, not the old arrays
    path.write_text(PBRT_SCENE.replace("[45]", "[30]"))
    s3 = Scene()
    s3.load_model(str(path))
    assert s3.camera_override.fov == 30.0
