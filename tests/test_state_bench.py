import json
import os

import numpy as np
import pytest

from fluctus_tpu.settings import Settings
from fluctus_tpu.state_io import load_state, save_state, state_path


def test_state_roundtrip(tmp_path):
    s = Settings()
    s.camera.pos = (1.0, 2.0, 3.0)
    s.camera.fov = 45.0
    s.camera.camera_rotation = (10.0, -5.0)
    s.area_light.E = (7.0, 8.0, 9.0)
    s.max_path_depth = 6
    s.use_env_map = True
    s.tonemap = 1
    p = str(tmp_path / "state_test.dat")
    save_state(p, s, env_map_strength=2.5, exposure=1.5)

    s2 = Settings()
    strength, exposure = load_state(p, s2)
    assert strength == 2.5 and exposure == 1.5
    np.testing.assert_allclose(s2.camera.pos, s.camera.pos)
    assert s2.camera.fov == 45.0
    np.testing.assert_allclose(s2.camera.camera_rotation, (10.0, -5.0))
    np.testing.assert_allclose(s2.area_light.E, (7.0, 8.0, 9.0))
    assert s2.max_path_depth == 6
    assert s2.use_env_map is True
    assert s2.tonemap == 1


def test_state_file_size(tmp_path):
    """Binary layout: 3+3+9*3+2+1 floats + 6 uints + 1 float + 1 uint...
    fixed 37 f32 + 8 u32-equivalents = 45 * 4 bytes? Count explicitly:
    rot(2) speed fov focal aperture = 6; 4 cam vecs = 12; 4 light vecs +
    E = 15; size 2; strength 1 -> 36 f32; 6 flags + exposure + tm = 8
    -> 44 words = 176 bytes."""
    s = Settings()
    p = str(tmp_path / "s.dat")
    save_state(p, s)
    assert os.path.getsize(p) == 176


def test_bm_json_harness(tmp_path, assets):
    from fluctus_tpu.bench import run_benchmark_file
    spec = {
        "settings": {
            "windowWidth": 32, "windowHeight": 32,
            "maxSpp": 2, "maxPathDepth": 2,
            "useEnvMap": True,
            "envMap": "/root/reference/assets/env_maps/night.hdr",
        },
        "scenes": [{"file": "/root/reference/assets/teapot.ply"}],
        "outputFolder": "out",
    }
    p = tmp_path / "test.bm.json"
    p.write_text(json.dumps(spec))
    results = run_benchmark_file(str(p))
    assert len(results) == 1
    assert results[0].averages["spp"] == 2
    out = tmp_path / "out"
    assert (out / "teapot.png").exists()
    assert (out / "teapot.hdr").exists()
    csv = (out / "results.csv").read_text().splitlines()
    assert csv[0] == "scene;time;primary;extension;shadow;total;samples"
    assert (out / "results.txt").read_text().strip()


def test_bm_json_harness_wavefront(tmp_path, assets):
    """useWavefront routes the harness to the throughput integrator
    (Tracer::update path) with the exact-spp cap active — the same
    .bm.json measures the flagship path (tracer.cpp:567-873)."""
    from fluctus_tpu.bench import run_benchmark_file
    spec = {
        "settings": {
            "windowWidth": 32, "windowHeight": 32,
            "maxSpp": 2, "maxPathDepth": 2,
            "useWavefront": True, "wfBufferSize": 256,
            "useEnvMap": True,
            "envMap": "/root/reference/assets/env_maps/night.hdr",
        },
        "scenes": [{"file": "/root/reference/assets/teapot.ply"}],
        "outputFolder": "out",
    }
    p = tmp_path / "test.bm.json"
    p.write_text(json.dumps(spec))
    results = run_benchmark_file(str(p))
    assert len(results) == 1
    av = results[0].averages
    assert av["spp"] == 2            # exact cap reached on every pixel
    assert av["extension"] > 0       # wavefront counters flowed through
    out = tmp_path / "out"
    assert (out / "teapot.png").exists()
    csv = (out / "results.csv").read_text().splitlines()
    assert csv[0] == "scene;time;primary;extension;shadow;total;samples"


def test_state_reference_byte_layout(tmp_path):
    """Independently hand-encode a state file following the reference's
    iterateStateItems field list (tracer.cpp:1007-1046: floats/cl_uints,
    little-endian, float3 as 3 floats — write helpers tracer.cpp:981-993)
    and check load_state decodes every field; then save_state must emit
    the identical byte string."""
    import struct

    from fluctus_tpu import state_io
    from fluctus_tpu.settings import Settings

    f = lambda v: struct.pack("<f", v)
    u = lambda v: struct.pack("<I", v)
    v3 = lambda x, y, z: f(x) + f(y) + f(z)

    blob = b"".join([
        f(0.1), f(0.2),              # cameraRotation.x/y
        f(1.5),                      # cameraSpeed
        f(62.0),                     # fov
        f(3.25),                     # focalDist
        f(0.125),                    # apertureSize
        v3(0.0, 0.0, -1.0),          # camera.dir
        v3(1.0, 2.0, 5.0),           # camera.pos
        v3(1.0, 0.0, 0.0),           # camera.right
        v3(0.0, 1.0, 0.0),           # camera.up
        v3(0.0, -1.0, 0.0),          # areaLight.N
        v3(0.5, 3.0, 0.5),           # areaLight.pos
        v3(1.0, 0.0, 0.0),           # areaLight.right
        v3(0.0, 0.0, 1.0),           # areaLight.up
        v3(6.0, 6.0, 6.0),           # areaLight.E
        f(0.75), f(0.25),            # areaLight.size.x/y
        f(1.25),                     # envMapStrength
        u(7),                        # maxBounces
        u(1), u(0), u(1), u(1), u(0),  # flags
        f(0.8),                      # exposure
        u(2),                        # tmOperator
    ])
    path = tmp_path / "state_ref.dat"
    path.write_bytes(blob)

    s = Settings()
    env, exposure = state_io.load_state(str(path), s)
    assert s.camera.camera_rotation == (np.float32(0.1), np.float32(0.2))
    assert s.camera.camera_speed == np.float32(1.5)
    assert s.camera.fov == 62.0
    assert s.camera.focal_dist == 3.25
    assert s.camera.aperture_size == 0.125
    assert s.camera.pos == (1.0, 2.0, 5.0)
    assert s.area_light.E == (6.0, 6.0, 6.0)
    assert s.area_light.size == (0.75, 0.25)
    assert env == 1.25
    assert s.max_path_depth == 7
    assert s.use_area_light and not s.use_env_map
    assert s.sample_explicit and s.sample_implicit
    assert not s.use_russian_roulette
    assert exposure == np.float32(0.8)
    assert s.tonemap == 2

    out = tmp_path / "state_out.dat"
    state_io.save_state(str(out), s, env_map_strength=env, exposure=exposure)
    assert out.read_bytes() == blob


def test_plot_benchmarks_tool(tmp_path):
    """tools/plot_benchmarks.py (reference repo-root plotter role) parses
    the harness CSV schema and writes one PNG per scene."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "plot_benchmarks", "tools/plot_benchmarks.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    csv1 = tmp_path / "run1.csv"
    csv1.write_text("scene;time;primary;extension;shadow;total;samples\n"
                    "cat.obj;0.5;1;2;1;4;0.2\ncat.obj;1.0;2;3;2;7;0.4\n"
                    "cat.obj;1.5;2;3;2;7;0.4\n")
    out = mod.main([str(csv1), "--out-dir", str(tmp_path)])
    assert len(out) == 1 and out[0].endswith("bench_cat.png")
    import os
    assert os.path.getsize(out[0]) > 1000


def test_fixed_benchmark_fallbacks():
    """The fixed protocol substitutes same-scale grid compositions for the
    non-shipping conference/country_kitchen scenes."""
    import os
    from fluctus_tpu.bench.harness import FIXED_FALLBACKS, FIXED_SCENES
    assert FIXED_SCENES[1] in FIXED_FALLBACKS
    assert FIXED_SCENES[2] in FIXED_FALLBACKS
    for fb in FIXED_FALLBACKS.values():
        assert os.path.exists(fb), fb


def test_fixed_benchmark_runs_small(tmp_path, monkeypatch):
    """run_benchmark end-to-end on a tiny scene/size (wiring check for
    the fixed protocol path, tracer.cpp:391-565)."""
    from fluctus_tpu.bench.harness import run_benchmark
    from fluctus_tpu.settings import Settings
    s = Settings()
    s.use_env_map = True
    s.use_area_light = False
    s.max_path_depth = 2
    s.wf_buffer_size = 1024
    s.use_wavefront = True
    monkeypatch.chdir(tmp_path)
    res = run_benchmark(scenes=["/root/reference/assets/teapot.ply"],
                        width=16, height=16, seconds=1.0, settings=s)
    assert len(res) == 1
    assert res[0].averages["total"] >= 0.0
    assert res[0].averages["elapsed"] > 0.0
