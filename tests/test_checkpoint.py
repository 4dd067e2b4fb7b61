"""Render checkpoint/resume: the film accumulation survives a renderer
restart and resumed rendering continues the SAME estimate."""

import numpy as np

from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings

SCENE = "/root/reference/assets/teapot.ply"
ENV = "/root/reference/assets/env_maps/night.hdr"


def _mk(tmp_path):
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene(SCENE, env_map=ENV)
    return r


def test_checkpoint_roundtrip_and_resume(tmp_path):
    r1 = _mk(tmp_path)
    r1.init_wavefront()
    r1.render_wavefront(6)
    ck = str(tmp_path / "render.ckpt.npz")
    r1.save_checkpoint(ck)
    w1 = np.asarray(r1.wavefront_film().weight)
    assert w1.sum() > 0

    # fresh renderer resumes the accumulation
    r2 = _mk(tmp_path)
    r2.init_wavefront()
    assert r2.load_checkpoint(ck)
    w2 = np.asarray(r2._wf_state.film.weight)
    np.testing.assert_array_equal(w2, w1)
    r2.render_wavefront(4)
    w3 = np.asarray(r2.wavefront_film().weight)
    assert w3.sum() > w1.sum()   # accumulation continued on top

    # mismatched resolution refuses
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.wf_buffer_size = 2048
    r3 = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r3.load_scene(SCENE, env_map=ENV)
    assert not r3.load_checkpoint(ck)
