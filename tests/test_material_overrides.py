"""Per-instance material overrides in .sc.json (the ``materials`` block,
scene.py:load_scene_file) and the full_zoo stress composition built on
them (tools/make_fullzoo.py — the country_kitchen-scale milestone-5
workload, VERDICT r4 next #4)."""

import json

import numpy as np
import pytest

from fluctus_tpu import bxdf_types as bx
from fluctus_tpu.scene import Scene

TEAPOT = "/root/reference/assets/teapot.ply"


def _write(tmp_path, entries):
    p = tmp_path / "zoo.sc.json"
    p.write_text(json.dumps(entries))
    return str(p)


def test_override_clones_per_instance(tmp_path):
    path = _write(tmp_path, [
        {"file": TEAPOT, "translation": [0, 0, 0],
         "materials": {"<default>": {"shader": "ideal_reflection",
                                     "Ks": [1.0, 0.8, 0.4]}}},
        {"file": TEAPOT, "translation": [10, 0, 0],
         "materials": {"<default>": {"shader": "emissive",
                                     "Ke": [5.0, 4.0, 3.0]}}},
        {"file": TEAPOT, "translation": [20, 0, 0]},   # untouched default
    ])
    s = Scene()
    s.load_model(path)
    p, n, t, m = s.triangle_arrays()
    assert p.shape[0] == 3 * 3206                     # geometry instanced
    per = np.unique(m.reshape(3, -1), axis=1)
    # instance 1 and 2 got distinct cloned rows; instance 3 kept row 0
    ids = [int(np.unique(m.reshape(3, -1)[i])[0]) for i in range(3)]
    assert len(set(ids)) == 3 and ids[2] == 0
    assert s.materials[ids[0]].type == bx.BXDF_IDEAL_REFLECTION
    assert s.materials[ids[0]].Ks == (1.0, 0.8, 0.4)
    assert s.materials[ids[1]].type == bx.BXDF_EMISSIVE
    assert s.materials[0].type == bx.BXDF_DIFFUSE     # original untouched
    assert s.material_types & bx.BXDF_EMISSIVE
    del per


def test_override_inference_uses_premap_ns(tmp_path):
    """Inference must see the PRE-remap phong exponent (the MTL loader
    infers before to_roughness): Kd+Ks+Ni>1+Ns>1 => rough reflection."""
    path = _write(tmp_path, [
        {"file": TEAPOT,
         "materials": {"<default>": {"Kd": [0.2, 0.1, 0.05],
                                     "Ks": [0.9, 0.6, 0.3],
                                     "Ni": 1.45, "Ns": 220.0}}},
    ])
    s = Scene()
    s.load_model(path)
    mid = int(s.triangle_arrays()[3][0])
    mat = s.materials[mid]
    assert mat.type == bx.BXDF_GGX_ROUGH_REFLECTION
    # stored Ns is the post-remap GGX alpha
    assert 0.0 < mat.Ns < 0.15


def test_override_unknown_shader_raises(tmp_path):
    path = _write(tmp_path, [
        {"file": TEAPOT, "materials": {"<default>": {"shader": "nope"}}},
    ])
    with pytest.raises(ValueError):
        Scene().load_model(path)


def test_full_zoo_composition():
    """The generated stress scene covers every BXDF type at ~500k+ tris
    with textures incl. a normal map (country_kitchen-scale workload)."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from make_fullzoo import make_fullzoo
    out = make_fullzoo()
    s = Scene()
    s.load_model(out)
    assert s.num_triangles > 500_000
    for name in ("DIFFUSE", "GLOSSY", "GGX_ROUGH_REFLECTION",
                 "IDEAL_REFLECTION", "GGX_ROUGH_DIELECTRIC",
                 "IDEAL_DIELECTRIC", "EMISSIVE", "MIXED"):
        assert s.material_types & getattr(bx, "BXDF_" + name), name
    assert len(s.textures) >= 4
    assert sum(1 for m in s.materials if m.map_N >= 0) > 0


def test_tiny_zoo_renders(tmp_path):
    """End-to-end: cloned/overridden materials survive device upload and
    a short mk render (emissive teapot must light the frame)."""
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings

    path = _write(tmp_path, [
        {"file": TEAPOT, "translation": [0, 0, 0],
         "materials": {"<default>": {"shader": "emissive",
                                     "Ke": [20.0, 16.0, 12.0]}}},
        {"file": TEAPOT, "translation": [2.5, 0, 0],
         "materials": {"<default>": {"shader": "diffuse",
                                     "Kd": [0.8, 0.2, 0.2]}}},
    ])
    s = Settings()
    s.use_env_map = False
    s.use_area_light = False
    s.max_path_depth = 3
    s.camera.pos = (1.2, 0.5, 4.0)
    s.camera.dir = (0.0, -0.1, -1.0)
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene(path, use_saved_state=False)
    r.render_single(spp=8)
    img = r.hdr_image()
    assert np.isfinite(img).all()
    assert img.max() > 0.5          # emissive visible

    # wavefront integrator accumulates the same implicit emission
    r.reset()
    r.init_wavefront(4096)
    r.render_wavefront(10)
    img_wf = r.hdr_image()
    assert np.isfinite(img_wf).all()
    assert img_wf.max() > 0.5
    # same emissive region lights up (coarse agreement; both unbiased)
    assert abs(float(img_wf.mean()) - float(img.mean())) \
        < 0.5 * max(float(img.mean()), 1e-3) + 0.05
