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


def test_wavefront_dispatch_variants_agree(teapot_render, monkeypatch):
    """The four render_wavefront host-dispatch shapes (phased+fused-shade,
    phased+resolve/logic, phased+deferred-splat-batching, single fused
    program) are A/B'd against each other in hardware sweeps — they must
    produce the same film and identical integer counters for the same
    pool (same jitted math, different program partitions)."""
    r, tmp = teapot_render

    def run(phases, fused, every):
        monkeypatch.setenv("FLT_WF_PHASES", phases)
        monkeypatch.setenv("FLT_WF_FUSED_SHADE", fused)
        monkeypatch.setenv("FLT_SPLAT_EVERY", every)
        r.init_wavefront(num_tasks=1024)
        r.render_wavefront(4, sync=True)
        st = r.wavefront_stats()
        film = np.stack([np.asarray(r._wf_state.film.color.x),
                         np.asarray(r._wf_state.film.color.y),
                         np.asarray(r._wf_state.film.color.z),
                         np.asarray(r._wf_state.film.weight)])
        return film, (int(st.primary_rays), int(st.extension_rays),
                      int(st.shadow_rays), int(st.samples))

    base_film, base_cnt = run("1", "1", "1")
    assert base_cnt[3] > 0 and base_film[3].sum() > 0
    for phases, fused, every in (("1", "0", "1"), ("1", "0", "2"),
                                 ("0", "1", "1")):
        film, cnt = run(phases, fused, every)
        assert cnt == base_cnt, (phases, fused, every)
        np.testing.assert_allclose(film, base_film, rtol=1e-5, atol=1e-6,
                                   err_msg=f"{phases}/{fused}/{every}")
