import os

import numpy as np
import pytest

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings


@pytest.fixture(scope="module")
def teapot_render(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("render")
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 4
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    r = Renderer(64, 64, settings=s, data_dir=str(tmp / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    r.render_single(spp=4)
    return r, tmp


def test_teapot_end_to_end(teapot_render):
    r, tmp = teapot_render
    img = r.hdr_image()
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.0       # something is lit
    ldr = r.ldr_image()
    assert (ldr >= 0).all() and (ldr <= 1).all()
    # some variation (not a constant image)
    assert ldr.std() > 0.01


def test_image_export(teapot_render):
    r, tmp = teapot_render
    png = str(tmp / "out.png")
    hdr = str(tmp / "out.hdr")
    r.save_image(png)
    r.save_image(hdr)
    assert os.path.getsize(png) > 100
    from fluctus_tpu import rgbe
    back, w, h = rgbe.read_hdr(hdr)
    assert (w, h) == (64, 64)
    np.testing.assert_allclose(back, r.hdr_image(), rtol=0.05, atol=1e-2)


def test_bvh_cache_reuse(teapot_render):
    r, tmp = teapot_render
    cache_dir = tmp / "data" / "hierarchies"
    files = list(cache_dir.glob("hierarchy_*.bin"))
    assert len(files) == 1
    # second renderer should import from cache and produce identical film
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 4
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    r2 = Renderer(64, 64, settings=s, data_dir=str(tmp / "data"))
    r2.load_scene("/root/reference/assets/teapot.ply",
                  env_map="/root/reference/assets/env_maps/night.hdr")
    r2.render_single(spp=4)
    np.testing.assert_allclose(r2.hdr_image(), r.hdr_image(), atol=1e-5)


def test_stats(teapot_render):
    r, tmp = teapot_render
    assert int(r.stats.primary_rays) == 64 * 64 * 4
    assert int(r.stats.samples) == 64 * 64 * 4
    assert int(r.stats.shadow_rays) > 0
    perf = r.perf_mrays(1.0)
    assert perf["total"] > 0


def test_dispatch_knobs_settings_and_env(teapot_render, monkeypatch):
    """Host-dispatch tuning knobs route settings.json -> Settings ->
    renderer, with FLT_* env reserved as the experiment override
    (flags.py registry; reference analogue: compile-time defines,
    clcontext.cpp:145-155)."""
    r, tmp = teapot_render
    s = Settings()
    s.import_json({"wfPhases": False, "wfSplatEvery": 3,
                   "wfFusedShade": False, "wfBlockRing": False})
    assert (s.wf_phases, s.wf_splat_every,
            s.wf_fused_shade, s.wf_block_ring) == (False, 3, False, False)

    old = r.settings
    try:
        r.settings = s
        r.init_wavefront(num_tasks=1024)
        assert r._wf_phased is False and r._splat_every == 3
        # env override beats the settings value (sweep knob)
        monkeypatch.setenv("FLT_WF_PHASES", "1")
        monkeypatch.setenv("FLT_SPLAT_EVERY", "2")
        r.init_wavefront(num_tasks=1024)
        assert r._wf_phased is True and r._splat_every == 2
    finally:
        r.settings = old
        r.init_wavefront(num_tasks=1024)
