import json
import os

import numpy as np
import pytest

from fluctus_tpu import bxdf_types as bx
from fluctus_tpu.scene import Scene, ModelTransform
from fluctus_tpu.scene.material import HostMaterial, infer_type


def test_obj_load_egyptcat(assets):
    s = Scene()
    s.load_model(os.path.join(assets, "egyptcat/egyptcat.obj"))
    assert s.num_triangles > 1000
    p, n, t, m = s.triangle_arrays()
    assert p.shape == (s.num_triangles, 3, 3)
    # normals normalized
    ln = np.linalg.norm(n.reshape(-1, 3), axis=1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-3)
    # materials: default + 3 from mtl
    assert len(s.materials) == 4
    names = [mat.name for mat in s.materials]
    assert "egyptcat" in names
    cat = s.materials[names.index("egyptcat")]
    assert cat.type == bx.BXDF_GLOSSY  # explicit "shader glossy" tag
    assert cat.map_Kd >= 0             # EgyptCat.png loaded
    assert s.textures[cat.map_Kd].width > 0
    # mat ids reference valid materials
    assert m.min() >= 0 and m.max() < len(s.materials)


def test_ply_load_teapot():
    s = Scene()
    s.load_model("/root/reference/assets/teapot.ply")
    assert s.num_triangles > 1000
    p, n, t, m = s.triangle_arrays()
    assert (m == 0).all()  # default material
    assert np.isfinite(p).all()


def test_material_heuristics():
    # glass: Kt only -> ideal dielectric, Ks := Kt
    m = HostMaterial(Kt=(0.9, 0.9, 0.9), Ni=1.5)
    assert infer_type(m, False) == bx.BXDF_IDEAL_DIELECTRIC
    assert m.Ks == (0.9, 0.9, 0.9)
    # Ks only -> glossy
    m = HostMaterial(Ks=(0.5, 0.5, 0.5))
    assert infer_type(m, False) == bx.BXDF_GLOSSY
    # Kd + Ks with Ni,Ns > 1 -> GGX reflection
    m = HostMaterial(Kd=(0.5, 0.5, 0.5), Ks=(0.5, 0.5, 0.5), Ni=1.5, Ns=100.0)
    assert infer_type(m, False) == bx.BXDF_GGX_ROUGH_REFLECTION
    # emission wins
    m = HostMaterial(Kd=(0.5, 0.5, 0.5), Ke=(1.0, 1.0, 1.0))
    assert infer_type(m, False) == bx.BXDF_EMISSIVE
    # multiple components, still diffuse -> mixed
    m = HostMaterial(Kd=(0.5, 0.5, 0.5), Kt=(0.2, 0.2, 0.2), Ni=1.0)
    assert infer_type(m, False) == bx.BXDF_MIXED
    # explicit shader tag short-circuits
    m = HostMaterial(Kt=(0.9, 0.9, 0.9), type=bx.BXDF_DIFFUSE)
    assert infer_type(m, True) == bx.BXDF_DIFFUSE


def test_scene_file(tmp_path, assets):
    sc = [{"file": os.path.join(assets, "psor/psor-cube.obj"),
           "scale": 2.0, "translation": [1.0, 0.0, 0.0]}]
    path = tmp_path / "combo.sc.json"
    path.write_text(json.dumps(sc))
    s = Scene()
    s.load_model(str(path))
    assert s.num_triangles > 0
    # transform applied: compare against untransformed load
    s2 = Scene()
    s2.load_model(os.path.join(assets, "psor/psor-cube.obj"))
    p1 = s.triangle_arrays()[0]
    p2 = s2.triangle_arrays()[0]
    np.testing.assert_allclose(p1, p2 * 2.0 + np.array([1.0, 0, 0]), atol=1e-4)


def test_scene_file_skip_materials(tmp_path, assets):
    """skipMaterials .sc.json extension (tools/make_bigscene.py --open):
    listed materials' triangles are dropped per instance, and instancing
    reuse keys on the skip set."""
    cat = os.path.join(assets, "egyptcat/egyptcat.obj")
    sc = [
        {"file": cat, "translation": [0.0, 0.0, 0.0],
         "skipMaterials": ["mag_ground", "mat_light"]},
        {"file": cat, "translation": [23.0, 0.0, 0.0],
         "skipMaterials": ["mag_ground", "mat_light"]},   # instanced reuse
    ]
    path = tmp_path / "open.sc.json"
    path.write_text(json.dumps(sc))
    s = Scene()
    s.load_model(str(path))
    p, n, uv, mid = s.triangle_arrays()
    # full model = 16,040 tris (16,000 statue + 12 shell + 28 light)
    assert len(p) == 2 * 16000
    names = {s.materials[i].name for i in set(mid.tolist())}
    assert names == {"egyptcat"}
    # no shell: nothing above the statue's 2.73-unit height
    assert float(p[:, :, 1].max()) < 3.0
    # the second instance is the first, translated
    np.testing.assert_allclose(p[16000:] - np.array([23.0, 0, 0]),
                               p[:16000], atol=1e-4)


def test_device_upload(assets):
    s = Scene()
    s.load_model(os.path.join(assets, "egyptcat/egyptcat.obj"))
    mats = s.device_materials()
    assert mats.type.shape[0] == max(128, len(s.materials))  # padded tables
    atlas = s.device_textures()
    assert atlas.count == len(s.textures)
    assert int(atlas.texels.shape[0]) >= int(atlas.width[0]) * int(atlas.height[0])
    assert s.world_radius() > 0.0
