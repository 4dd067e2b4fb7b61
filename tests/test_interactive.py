"""Headless interactive REPL (Tracer-UI stand-in): commands mutate camera
state like the reference key handler and refresh the preview."""

import io
import os

import numpy as np

from fluctus_tpu.interactive import run_interactive
from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings


def test_interactive_session(tmp_path):
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.camera.camera_speed = 0.5
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")

    out = str(tmp_path / "preview.png")
    script = io.StringIO("spp 2\nw\nlook 10 0\nsave\nload\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 6
    assert os.path.exists(out)
    # camera moved forward by cameraSpeed along dir, then rotated
    assert abs(r.settings.camera.pos[2] - (4.0 - 0.5 * abs(
        np.float32(s.camera.dir[2])))) < 0.6
    assert r.settings.camera.camera_rotation[0] != 0.0
    # state file written by `save`
    from fluctus_tpu import state_io
    assert os.path.exists(state_io.state_path(str(tmp_path / "data"),
                                              r.scene.hash))


def test_interactive_material_edit(tmp_path):
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.wf_buffer_size = 2048
    r = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "p.png")
    script = io.StringIO("spp 1\nmats\nmat 0 kd 0.9 0.1 0.1\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 4
    assert r.scene.materials[0].Kd == (0.9, 0.1, 0.1)
    # device scene re-uploaded with the edit
    import jax.numpy as jnp
    kd0 = float(r.device_scene.mats.Kd.x[0])
    assert abs(kd0 - 0.9) < 1e-6


def test_fast_preview_splat(tmp_path):
    """`preview 1` renders one segment and force-splats incomplete paths
    (splatPreview, mk_splat_preview.cl:13-25): covered pixels show pool
    Ei, uncovered keep the accumulation; the accumulation is untouched."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "preview.png")
    script = io.StringIO("preview 1\nw\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 3
    assert os.path.exists(out)
    # the preview film is a view: accumulation plus provisional samples
    # from in-flight paths (weights grow by the live-lane counts)
    pf = r.film
    w = np.asarray(pf.weight)
    acc = r.wavefront_film()
    aw = np.asarray(acc.weight)
    assert w.shape[0] == 256 and (w >= aw).all() and (w > aw).any()
    # blended radiance is accumulation + partial Ei (never darker)
    assert (np.asarray(pf.color.x) >= np.asarray(acc.color.x) - 1e-6).all()
    # the preview image is not black
    from fluctus_tpu.core.tonemap import postprocess
    assert float(np.asarray(pf.color.x).sum()) > 0.0


def test_scene_switch_and_sampling_cycle(tmp_path):
    """REPL `scene` swaps the loaded scene (quickLoadScene / selectScene,
    tracer.cpp:1198) and `sampling` cycles MIS -> explicit -> implicit."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.wf_buffer_size = 2048
    s.shortcuts[2] = "/root/reference/assets/psor/psor-cube.obj"
    r = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    n0 = r.scene.num_triangles
    out = str(tmp_path / "p.png")
    script = io.StringIO("spp 1\nscene 2\nsampling\nsampling\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 5
    assert r.scene.num_triangles != n0          # psor-cube loaded
    # MIS -> explicit -> implicit after two cycles
    assert r.settings.sample_implicit and not r.settings.sample_explicit
    # the STATIC config the jitted integrator branches on followed the
    # settings (recompileKernels analogue) — not just the settings object
    assert r.config.sample_impl and not r.config.sample_expl
    assert r._wf_cfg.sample_impl and not r._wf_cfg.sample_expl


def test_light_cycle_and_pick(tmp_path):
    """REPL `light` cycles env -> area -> both (toggleLightSourceMode)
    and `pick` sets the DoF focal distance from a scene hit."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = True
    s.max_path_depth = 2
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    fd0 = r.settings.camera.focal_dist
    out = str(tmp_path / "p.png")
    script = io.StringIO("spp 1\nlight\npick 0.5 0.4\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 4
    # both -> environment
    assert r.settings.use_env_map and not r.settings.use_area_light
    assert r.config.use_env_map and not r.config.use_area_light
    assert not r._wf_cfg.use_area_light
    # the center-ish ray hits the teapot -> focal distance updated
    assert r.settings.camera.focal_dist != fd0
    assert 0.5 < r.settings.camera.focal_dist < 20.0


def test_more_refines_without_restart(tmp_path):
    """`more` continues accumulation (idle iteration) instead of
    restarting: average spp strictly increases."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.camera.pos = (0.0, 1.0, 4.0)
    s.camera.dir = (0.0, -0.15, -1.0)
    s.wf_buffer_size = 2048
    r = Renderer(16, 16, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "p.png")
    script = io.StringIO("spp 2\nlook 1 0\nmore 4\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 4
    w = np.asarray(r.film.weight)
    # 2 segments of refresh + 4 more at 2048 lanes / 256 px = 8 lanes/px:
    # strictly more than the refresh alone could deposit
    assert w.mean() > 2.0


def test_interactive_postprocess_controls(tmp_path):
    """tonemap/exposure/blend round-trip through _make_params/postprocess
    WITHOUT restarting accumulation (tracer_ui.cpp:355-366 sliders +
    DenoiserOptix::setBlend)."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.wf_buffer_size = 2048
    s.use_denoiser = True
    r = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "p.png")
    script = io.StringIO("spp 6\nw\ntonemap 3\nexposure 2.5\nblend 0.25\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 6
    assert os.path.exists(out)
    # settings mutated and wired into the live render params
    assert r.settings.tonemap == 3
    assert float(r.params.pp.tm_operator) == 3
    assert r.exposure == 2.5
    assert float(r.params.pp.exposure) == 2.5
    assert r.settings.denoiser_blend == 0.25
    # accumulation was NOT restarted by the postprocess commands: the
    # film still carries the weight from the `w` refresh
    assert float(np.asarray(r.film.weight).sum()) > 0

    # tonemap with no arg cycles 3 -> 0, and exposure scales the LDR image
    img_raw = r.ldr_image()
    script = io.StringIO("tonemap\nexposure 0.1\nq\n")
    run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert r.settings.tonemap == 0
    img_dim = r.ldr_image()
    assert img_dim.mean() < img_raw.mean()


def test_interactive_renderer_panel_controls(tmp_path):
    """The remaining toolbar widgets (tracer_ui.cpp:129-486): path depth,
    RR, maxSpp, render scale, aperture, env strength, area-light
    size/intensity/color — each round-trips through settings into the
    static config (retrace) or the live RenderParams."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = True
    s.max_path_depth = 2
    s.wf_buffer_size = 2048
    r = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "p.png")
    script = io.StringIO(
        "spp 2\ndepth 3\nrr 1\nmaxspp 7\naperture 0.002\n"
        "envstrength 2.5\narealight size 1.5\narealight int 40\n"
        "arealight color 1 0.5 0.25\nscale 0.5\nq\n")
    n = run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert n == 11
    # compile-time flags landed in the static config (retrace path)
    assert r.settings.max_path_depth == 3 and r.config.max_bounces == 3
    assert r.settings.use_russian_roulette and r.config.use_roulette
    assert r.config.max_spp == 7 and int(r.params.max_spp) == 7
    # dynamic params landed in the live RenderParams
    assert abs(float(r.params.camera.aperture_size) - 0.002) < 1e-8
    assert float(r.params.env_map_strength) == 2.5
    al = r.settings.area_light
    assert al.size == (1.5, 1.5)
    # `int 40` sets the peak; `color 1 .5 .25` re-tints preserving it
    assert al.E == (40.0, 20.0, 10.0)
    assert float(r.params.area_light.E.x) == 40.0
    # scale 0.5 of the 8x8 launch size -> 4x4 film, reset accumulation
    assert (r.width, r.height) == (4, 4)
    assert np.asarray(r.film.weight).shape[0] == 16


def test_interactive_integrator_switch(tmp_path):
    """`integrator mk` previews via the exact-spp microkernel path
    (integrator combo, tracer_ui.cpp:129-150): the film weight is exactly
    the requested spp on every pixel, and `integrator wf` switches back."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.wf_buffer_size = 2048
    r = Renderer(8, 8, settings=s, data_dir=str(tmp_path / "data"))
    r.load_scene("/root/reference/assets/teapot.ply",
                 env_map="/root/reference/assets/env_maps/night.hdr")
    out = str(tmp_path / "p.png")
    script = io.StringIO("spp 3\nintegrator mk\nmore 2\nq\n")
    run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert not r.settings.use_wavefront
    w = np.asarray(r.film.weight)
    # 3 spp from the mk refresh + 2 from `more` (progressive renderSingle
    # accumulation, no restart)
    assert (w == 5).all(), "mk preview must deposit exactly spp samples"
    script = io.StringIO("integrator wf\nq\n")
    run_interactive(r, out_path=out, input_stream=script, echo=False)
    assert r.settings.use_wavefront
