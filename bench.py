#!/usr/bin/env python
"""Benchmark driver — renders the flagship scene on the real TPU and prints
one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's fixed benchmark (tracer.cpp:391-565):
a real scene at high resolution, measured in Mrays/s
(primary + extension + shadow rays per second, clcontext.cpp:666-674).
Baseline target: 200 Mrays/s/chip (BASELINE.json).

Scene: egyptcat (the only reference benchmark scene whose geometry ships in
this image; conference/country_kitchen .obj files are absent) at 1920x1080
with the night.hdr environment, GGX/glossy materials and textures.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MRAYS = 200.0

SCENE = "/root/reference/assets/egyptcat/egyptcat.obj"
ENV = "/root/reference/assets/env_maps/night.hdr"


def main():
    import contextlib
    import json as _json
    import threading

    # the axon tunnel occasionally wedges with backend init hanging
    # forever inside the PJRT handshake — abort loudly instead of letting
    # the whole benchmark run hang (first contact normally takes seconds)
    limit = float(os.environ.get("BENCH_INIT_TIMEOUT", "900"))

    def _abort():
        print(f"FATAL: TPU backend init did not complete in {limit:.0f} s "
              "(axon tunnel wedged?) — aborting bench", file=sys.stderr)
        os._exit(3)
    watchdog = threading.Timer(limit, _abort)
    watchdog.daemon = True
    watchdog.start()

    import jax
    jax.devices()          # first backend contact (the hang point)
    watchdog.cancel()

    from fluctus_tpu import compile_cache
    compile_cache.enable()

    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings

    # everything except the final JSON line goes to stderr
    with contextlib.redirect_stdout(sys.stderr):
        result = _run(jax, Renderer, Settings)
    print(_json.dumps(result))
    return 0


def _run(jax, Renderer, Settings):

    # Reference-default settings (settings.cpp:17-58). The camera/area-light
    # come from the committed per-scene state file
    # data/states/state_<hash>.dat (reference-default values, the exact
    # state the reference benchmark renders with when no saved state
    # exists) — loaded by Renderer.load_scene like Tracer::init does.
    s = Settings()
    s.use_env_map = True

    width, height = 1920, 1080
    r = Renderer(width, height, settings=s, data_dir="data")
    r.load_scene(SCENE, env_map=ENV)
    # the committed state fixture must have been found and applied — gate on
    # its existence (env_map_strength==1.0 is also the default, so it can't
    # detect a scene-hash drift silently rendering with default state)
    from fluctus_tpu import state_io
    fixture = state_io.state_path("data", r.scene.hash)
    assert os.path.exists(fixture), \
        f"benchmark state fixture missing for scene hash: {fixture}"

    mode = os.environ.get("BENCH_MODE", "wf")
    if mode == "wf":
        # throughput-tuned wavefront mode (the reference's headline path)
        num_tasks = int(os.environ.get("BENCH_TASKS", str(1 << 20)))
        segments = int(os.environ.get("BENCH_SEGMENTS", "48"))
        r.init_wavefront(num_tasks)
        r.render_wavefront(2)          # warmup/compile
        r.init_wavefront(num_tasks)
        t0 = time.time()
        r.render_wavefront(segments)
        elapsed = time.time() - t0
        st = r.wavefront_stats()
        scale = 1e6 * elapsed
        value = (int(st.primary_rays) + int(st.extension_rays)
                 + int(st.shadow_rays)) / scale
    else:
        r.render_single(spp=1)         # warmup (compile)
        r.reset()
        spp = int(os.environ.get("BENCH_SPP", "8"))
        t0 = time.time()
        r.render_single(spp=spp)
        elapsed = time.time() - t0
        perf = r.perf_mrays(elapsed)
        value = perf["total"]
    out = {
        "metric": "Mrays/s/chip (traverse+shade), egyptcat 1080p",
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / BASELINE_MRAYS, 4),
    }
    if os.environ.get("BENCH_BIG", "1") == "1":
        try:
            out["big_scene_320k"] = _run_big(Renderer, Settings)
        except Exception as e:       # never lose the headline number
            out["big_scene_320k"] = {"error": repr(e)[:200]}
    return out


def _run_big(Renderer, Settings):
    """Second entry at conference scale (tracer.cpp:419-424 names
    conference ~331k tris; the .obj doesn't ship, so the 5x4 egyptcat grid
    at 320,520 tris stands in): supercluster traversal tier +
    HBM-streamed resolve at 1080p."""
    s = Settings()
    s.use_env_map = True
    s.camera.pos = (0.0, 14.0, 40.0)
    s.camera.dir = (0.0, -0.35, -1.0)
    r = Renderer(1920, 1080, settings=s, data_dir="data")
    # BENCH_BIG_GRID=6x5 selects the ~481k-tri (country_kitchen scale)
    # composition; default 5x4 = 320k (conference scale)
    grid = os.environ.get("BENCH_BIG_GRID", "5x4")
    r.load_scene(f"data/bigscene/big_egyptcat_{grid}.sc.json", env_map=ENV,
                 use_saved_state=False)
    num_tasks = int(os.environ.get("BENCH_TASKS", str(1 << 20)))
    segments = int(os.environ.get("BENCH_BIG_SEGMENTS", "24"))
    r.init_wavefront(num_tasks)
    r.render_wavefront(2)          # warmup/compile
    r.init_wavefront(num_tasks)
    t0 = time.time()
    r.render_wavefront(segments)
    elapsed = time.time() - t0
    st = r.wavefront_stats()
    mrays = (int(st.primary_rays) + int(st.extension_rays)
             + int(st.shadow_rays)) / (1e6 * elapsed)
    n_tris = r.scene.triangle_arrays()[0].shape[0]
    return {"metric": f"Mrays/s/chip, {grid} egyptcat grid "
                      f"({n_tris // 1000}k tris) 1080p",
            "value": round(mrays, 2), "unit": "Mrays/s"}


if __name__ == "__main__":
    sys.exit(main())
