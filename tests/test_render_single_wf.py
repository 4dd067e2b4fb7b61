import numpy as np

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings


def test_exact_spp_wavefront_matches_mk():
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 3
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.wf_buffer_size = 4096

    r = Renderer(24, 24, settings=s, data_dir="/tmp/rswf")
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")

    film = r.render_single_wavefront(spp=4)
    spp = np.asarray(r._wf_state.spp)
    assert spp.min() >= 4 and spp.max() <= 4
    # the per-segment rank clip makes the cap EXACT (better than the
    # reference's racy CHECK_SPP, wf_logic.cl:177-189): weight == spp
    w = np.asarray(film.weight)
    assert (w == 4).all(), (w.min(), w.max())
    img_wf = r.hdr_image()

    r2 = Renderer(24, 24, settings=s, data_dir="/tmp/rswf")
    r2.load_scene("/root/reference/assets/teapot.ply",
                  env_map="/root/reference/assets/env_maps/night.hdr")
    r2.render_single(spp=16)
    img_mk = r2.hdr_image()

    # same scene, same estimators -> images agree within MC noise
    assert np.isfinite(img_wf).all()
    diff = np.abs(img_wf.mean() - img_mk.mean()) / max(img_mk.mean(), 1e-9)
    assert diff < 0.15


def test_free_running_after_exact_reinitializes():
    """render_wavefront after render_single_wavefront must not inherit the
    exact-spp capped config (which would silently block every splat): the
    free-running path re-initializes, like the reference's integrator
    toggle resets accumulation."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir="/tmp/rswf2")
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    r.init_wavefront()
    r.render_single_wavefront(spp=2)
    assert r._wf_cfg.max_spp == 1          # capped exact config active
    r.render_wavefront(4)
    assert r._wf_cfg.max_spp == 0          # re-initialized, cap off
    w = np.asarray(r.wavefront_film().weight)
    assert w.sum() > 0                      # splats actually accumulated
