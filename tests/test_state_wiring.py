"""Render-state lifecycle wiring (Tracer::init -> loadState, tracer.cpp:74;
saveState on F2, tracer.cpp:1087-1095): Renderer persists camera/light/flags
per scene hash and restores them on the next load of the same scene."""

import os

import numpy as np

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings

TEAPOT = "/root/reference/assets/teapot.ply"
ENV = "/root/reference/assets/env_maps/night.hdr"


def _mk(tmp_path, settings=None):
    s = settings or Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 3
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    return r


def test_save_then_autoload(tmp_path, assets):
    r = _mk(tmp_path)
    r.load_scene(TEAPOT, env_map=ENV)
    # mutate the live state like interactive camera moves would
    r.settings.camera.pos = (0.25, 1.75, 4.5)
    r.settings.camera.fov = 47.0
    r.settings.camera.camera_rotation = (12.0, -3.0)
    r.env_map_strength = 1.25
    r.exposure = 0.75
    path = r.save_state()
    assert os.path.exists(path)
    assert "state_" in os.path.basename(path)

    # a fresh renderer on the same scene restores everything at load
    r2 = _mk(tmp_path)
    r2.load_scene(TEAPOT, env_map=ENV)
    np.testing.assert_allclose(r2.settings.camera.pos, (0.25, 1.75, 4.5))
    assert r2.settings.camera.fov == 47.0
    assert r2.env_map_strength == 1.25
    assert r2.exposure == 0.75
    # and the jit params were built from the restored state
    assert float(r2.params.pp.exposure) == 0.75
    assert float(r2.params.env_map_strength) == 1.25
    assert float(r2.params.camera.fov) == 47.0


def test_state_optout(tmp_path, assets):
    r = _mk(tmp_path)
    r.load_scene(TEAPOT, env_map=ENV)
    r.settings.camera.fov = 33.0
    r.save_state()
    r3 = _mk(tmp_path)
    r3.load_scene(TEAPOT, env_map=ENV, use_saved_state=False)
    assert r3.settings.camera.fov == 60.0  # defaults kept


def test_bench_state_fixture_committed():
    """bench.py's camera comes from the committed egyptcat state file
    (reference-default values, settings.cpp:17-58)."""
    from fluctus_tpu import state_io
    p = state_io.state_path(os.path.join(os.path.dirname(__file__), "..",
                                         "data"), "10690531631905968616")
    assert os.path.exists(p), "egyptcat bench state fixture missing"
    s = Settings()
    s.camera.fov = 0.0  # sentinel: must be overwritten
    strength, exposure = state_io.load_state(p, s)
    assert (strength, exposure) == (1.0, 1.0)
    assert s.camera.fov == 60.0
    np.testing.assert_allclose(s.camera.pos, (0.0, 1.0, 3.5))
    np.testing.assert_allclose(s.camera.dir, (0.0, 0.0, -1.0))
    np.testing.assert_allclose(s.area_light.E, (100.0, 100.0, 100.0))
    assert s.use_env_map is True
    assert s.max_path_depth == 10
