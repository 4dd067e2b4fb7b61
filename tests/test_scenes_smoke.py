"""Smoke renders of the remaining reference scenes whose geometry ships in
the image (BASELINE.json configs 1/3)."""

import numpy as np
import pytest

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings


def _render(scene, **kw):
    s = Settings()
    s.use_env_map = True
    s.use_area_light = kw.pop("area_light", False)
    s.max_path_depth = 3
    for k, v in kw.items():
        setattr(s.camera, k, v)
    r = Renderer(24, 24, settings=s, data_dir="/tmp/smoke_data")
    r.load_scene(scene, env_map="/root/reference/assets/env_maps/night.hdr")
    r.render_single(spp=2)
    img = r.hdr_image()
    assert np.isfinite(img).all()
    assert img.max() > 0
    return r, img


def test_gold_rings():
    # GGX metal + textures config (BASELINE config 3)
    r, img = _render("/root/reference/assets/gold_rings/gold_rings_bark.obj")
    from fluctus_tpu import bxdf_types as bx
    assert r.scene.material_types & (bx.BXDF_GGX_ROUGH_REFLECTION
                                     | bx.BXDF_GLOSSY | bx.BXDF_DIFFUSE)


def test_psor_cube():
    r, img = _render("/root/reference/assets/psor/psor-cube.obj",
                     pos=(0.0, 1.0, 6.0))
    assert r.scene.num_triangles > 1000


def test_egyptcat_textured():
    r, img = _render("/root/reference/assets/egyptcat/egyptcat.obj",
                     pos=(0.0, 1.0, 3.5), area_light=True)
    assert len(r.scene.textures) >= 1  # EgyptCat.png


def test_bigscene_compositions_load():
    """The conference/kitchen-scale .sc.json grids load with instancing
    and reach the advertised triangle counts (no render: CPU-cheap)."""
    from fluctus_tpu.scene import Scene
    for grid, want in (("5x4", 320_000), ("6x5", 480_000)):
        s = Scene()
        s.load_model(f"data/bigscene/big_egyptcat_{grid}.sc.json")
        p = s.triangle_arrays()[0]
        assert p.shape[0] >= want, (grid, p.shape)
        assert s.hash  # cacheable (BVH + MXU tables key on it)
