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
