"""End-to-end multi-bounce white furnace: a unit-albedo teapot under a
uniform unit-radiance environment must render to ~1 everywhere — the
strongest whole-pipeline energy gate (camera, traversal, NEE+MIS weights,
RR-off paths, splat, accumulation all cancel exactly; concave regions
truncated at max depth account for the tolerance). Lobe-level furnace
tests live in test_bsdf.py; this one exercises the Renderer end to end
and BOTH integrators."""

import numpy as np
import pytest

from fluctus_tpu import rgbe
from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings


@pytest.fixture(scope="module")
def uniform_env(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("env") / "uniform.hdr")
    rgbe.write_hdr(path, np.ones((32, 64, 3), np.float32))
    return path


def _setup(tmp_path, uniform_env):
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.use_russian_roulette = False
    s.max_path_depth = 8
    s.camera.pos = (0.0, 1.2, 3.2)
    s.camera.dir = (0.0, -0.2, -1.0)
    s.wf_buffer_size = 4096
    r = Renderer(24, 24, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply", env_map=uniform_env,
                 use_saved_state=False)
    for m in r.scene.materials:
        m.Kd = (1.0, 1.0, 1.0)
    r.reload_materials()
    return r


def test_white_furnace_full_renderer_mk(tmp_path, uniform_env):
    r = _setup(tmp_path, uniform_env)
    r.render_single(spp=24)
    img = r.hdr_image()
    # every pixel (background AND teapot, incl. interreflections) ~ 1
    assert abs(float(img.mean()) - 1.0) < 0.03, img.mean()
    assert float(np.abs(img - 1.0).mean()) < 0.06


def test_white_furnace_full_renderer_wavefront(tmp_path, uniform_env):
    r = _setup(tmp_path, uniform_env)
    r.init_wavefront(4096)
    r.render_wavefront(140)
    r.film = r.wavefront_film()
    img = r.hdr_image()
    assert abs(float(img.mean()) - 1.0) < 0.03, img.mean()
    assert float(np.abs(img - 1.0).mean()) < 0.08
