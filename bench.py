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

Wedge resilience: the axon tunnel occasionally wedges — the PJRT handshake
in backend init never completes, and the wedged plugin poisons the whole
process (even later CPU-only init can hang). So the benchmark runs as a
SUPERVISOR that forks a fresh worker process per attempt, gives each
attempt a bounded init window, and retries with backoff inside the total
budget — like the reference CLT's device-selection retry loop
(clcontext.cpp:18-42). If every attempt wedges, it still prints a parsed
line carrying the last committed good value (marked stale) so a transient
tunnel failure cannot erase a round's evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_MRAYS = 200.0

SCENE = "/root/reference/assets/egyptcat/egyptcat.obj"
ENV = "/root/reference/assets/env_maps/night.hdr"

LAST_GOOD_PATH = os.environ.get(
    "BENCH_LAST_GOOD",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "data", "bench_last_good.json"))


# ---------------------------------------------------------------- supervisor

def supervise(argv):
    """Run the benchmark in fresh worker subprocesses, retrying wedged
    backend inits with backoff. Prints exactly one JSON line on stdout."""
    import signal

    # `timeout N python bench.py` signals only the supervisor; forward it
    # so a timed-out sweep entry can't orphan a worker that keeps holding
    # the TPU
    live = {"proc": None}

    def _forward(signum, frame):
        p = live["proc"]
        if p is not None and p.poll() is None:
            p.terminate()
        os._exit(124)
    signal.signal(signal.SIGTERM, _forward)
    signal.signal(signal.SIGINT, _forward)

    total_budget = float(os.environ.get("BENCH_INIT_TIMEOUT", "900"))
    attempt_limit = float(os.environ.get("BENCH_ATTEMPT_INIT_TIMEOUT",
                                         str(min(240.0, total_budget))))
    backoffs = [float(x) for x in
                os.environ.get("BENCH_RETRY_BACKOFF", "30,60,120").split(",")]

    deadline = time.time() + total_budget
    attempt = 0
    last_rc, last_tail = None, ""
    while True:
        attempt += 1
        env = dict(os.environ)
        env["BENCH_WORKER"] = "1"
        # per-attempt init watchdog inside the worker (rc=3 on wedge)
        env["BENCH_ATTEMPT_INIT_TIMEOUT"] = str(
            max(10.0, min(attempt_limit, deadline - time.time())))
        if attempt <= int(os.environ.get("BENCH_SIM_WEDGE", "0")):
            env["BENCH_SIM_WEDGE_NOW"] = "1"   # test hook: force a wedge
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + argv,
            env=env, stdout=subprocess.PIPE, text=True)
        live["proc"] = proc
        stdout, _ = proc.communicate()
        live["proc"] = None
        last_rc = proc.returncode
        if proc.returncode == 0:
            line = _json_line(stdout)
            if line is not None:
                print(json.dumps(line))
                _save_last_good(line)
                return 0
            last_tail = (stdout or "")[-300:]
            break                        # ran but produced no JSON: a bug
        if proc.returncode != 3:
            break                        # real failure, not an init wedge
        # rc=3: init wedged. Retry in a FRESH process if budget remains.
        wait = backoffs[min(attempt - 1, len(backoffs) - 1)]
        remaining = deadline - time.time()
        if remaining < wait + 10.0:
            print(f"bench: init wedged on attempt {attempt}, "
                  f"budget exhausted ({remaining:.0f}s left)", file=sys.stderr)
            break
        print(f"bench: init wedged on attempt {attempt}; retrying in "
              f"{wait:.0f}s ({remaining:.0f}s budget left)", file=sys.stderr)
        time.sleep(wait)

    # All attempts failed: still emit a parsed line with the last good value.
    out = {
        "metric": "Mrays/s/chip (traverse+shade), egyptcat 1080p",
        "value": None,
        "unit": "Mrays/s",
        "vs_baseline": None,
        "error": (f"TPU unavailable after {attempt} attempt(s), "
                  f"last rc={last_rc}" + (f": {last_tail}" if last_tail else "")),
        "stale": True,
    }
    lg = _load_last_good()
    if lg is not None:
        out["value"] = lg.get("value")
        out["vs_baseline"] = lg.get("vs_baseline")
        out["metric"] = (lg.get("metric", out["metric"])
                         + " [STALE: last good value, TPU wedged this run]")
        out["last_good"] = lg
    print(json.dumps(out))
    return 0 if lg is not None else 4


def _json_line(stdout: str):
    """Last parseable JSON object line of a worker's stdout."""
    for line in reversed((stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _save_last_good(obj):
    try:
        # Only default-flag runs may become the wedge-fallback headline:
        # an A/B arm with FLT_/BENCH_ overrides (e.g. the deliberately
        # degraded FLT_KEY=none sweep section) must never overwrite the
        # record the driver reports when the TPU is down (advisor r4).
        # Harness-control knobs (retry budget, wedge simulation, record
        # path) do not alter the measurement and are exempt; BENCH_FAKE
        # is exempt only when the record path is redirected (tests).
        exempt = {"BENCH_WORKER", "BENCH_LAST_GOOD", "BENCH_SIM_WEDGE",
                  "BENCH_SIM_WEDGE_NOW", "BENCH_INIT_TIMEOUT",
                  "BENCH_ATTEMPT_INIT_TIMEOUT", "BENCH_RETRY_BACKOFF"}
        if os.environ.get("BENCH_LAST_GOOD"):
            exempt.add("BENCH_FAKE")
        knobs = {k: v for k, v in os.environ.items()
                 if k.startswith(("FLT_", "BENCH_")) and k not in exempt}
        if knobs:
            print(f"bench: not persisting last-good (non-default knobs: "
                  f"{sorted(knobs)})", file=sys.stderr)
            return
        rec = dict(obj)
        rec["recorded_unix"] = int(time.time())
        os.makedirs(os.path.dirname(LAST_GOOD_PATH), exist_ok=True)
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1)
    except OSError as e:
        print(f"bench: could not save last-good record: {e}", file=sys.stderr)


def _load_last_good():
    # Prefer the dedicated committed record; fall back to the newest
    # committed BENCH_r*.json with a parsed value.
    try:
        with open(LAST_GOOD_PATH) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    best = None
    root = os.path.dirname(os.path.abspath(__file__))
    try:
        names = sorted(n for n in os.listdir(root)
                       if n.startswith("BENCH_r") and n.endswith(".json"))
    except OSError:
        return None
    for name in names:
        try:
            with open(os.path.join(root, name)) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = rec.get("parsed")
        if isinstance(parsed, dict) and parsed.get("value") is not None:
            parsed = dict(parsed)
            parsed["source"] = name
            best = parsed
    return best


# ------------------------------------------------------------------- worker

def worker_main():
    import contextlib
    import threading

    # Per-attempt init watchdog: the PJRT handshake normally completes in
    # seconds; if it doesn't, exit rc=3 so the supervisor retries in a
    # fresh process (a wedged plugin poisons this one).
    limit = float(os.environ.get("BENCH_ATTEMPT_INIT_TIMEOUT",
                                 os.environ.get("BENCH_INIT_TIMEOUT", "240")))

    def _abort():
        print(f"FATAL: TPU backend init did not complete in {limit:.0f} s "
              "(axon tunnel wedged?) — aborting attempt", file=sys.stderr)
        os._exit(3)

    # `import jax` never touches the PJRT plugin (the wedge point is the
    # FIRST BACKEND CONTACT — see PERF.md round-3 findings), so the import
    # runs under a generous outer guard and only devices() gets `limit`.
    outer = threading.Timer(limit + 300, _abort)
    outer.daemon = True
    outer.start()
    import jax
    outer.cancel()
    # During a wedge even JAX_PLATFORMS=cpu *env-var* init can hang (the
    # plugin is still probed); only config.update before first backend use
    # reliably avoids touching it (PERF.md round-3 findings).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    watchdog = threading.Timer(limit, _abort)
    watchdog.daemon = True
    watchdog.start()
    if os.environ.get("BENCH_SIM_WEDGE_NOW") == "1":
        time.sleep(limit + 60)         # test hook: simulate the hang
    jax.devices()          # first backend contact (the hang point)
    watchdog.cancel()

    if os.environ.get("BENCH_FAKE") == "1":
        # test hook: skip the render, emit a canned result
        print(json.dumps({"metric": "fake", "value": 1.0, "unit": "Mrays/s",
                          "vs_baseline": 0.005}))
        return 0

    from fluctus_tpu import compile_cache
    compile_cache.enable()

    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings

    # everything except the final JSON line goes to stderr
    with contextlib.redirect_stdout(sys.stderr):
        result = _run(jax, Renderer, Settings)
    print(json.dumps(result))
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
    if os.environ.get("BENCH_ZOO", "1") == "1":
        try:
            out["full_zoo_500k"] = _run_zoo(Renderer, Settings)
        except Exception as e:
            out["full_zoo_500k"] = {"error": repr(e)[:200]}
    return out


def _run_zoo(Renderer, Settings):
    """Third entry at country_kitchen scale (milestone 5, ~500k tris,
    BASELINE.md config 5): the full material-zoo stress composition —
    622k tris, all 8 BXDF types, 4 textures incl. a normal map, area
    light + env map, exterior camera over the open field
    (tools/make_fullzoo.py; generated on demand)."""
    scene_path = "data/bigscene/full_zoo.sc.json"
    if not os.path.exists(scene_path):
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from make_fullzoo import make_fullzoo
        make_fullzoo(scene_path)
    import math
    s = Settings()
    s.use_env_map = True
    s.use_area_light = True
    s.max_path_depth = 8
    s.camera.pos = (35.0, 14.0, 80.0)
    nrm = math.sqrt(35.0**2 + 13.0**2 + 80.0**2)
    s.camera.dir = (-35.0 / nrm, -13.0 / nrm, -80.0 / nrm)
    # sun-panel area light high over the field, facing down
    s.area_light.pos = (0.0, 40.0, 20.0)
    s.area_light.N = (0.0, -1.0, 0.0)
    s.area_light.right = (1.0, 0.0, 0.0)
    s.area_light.up = (0.0, 0.0, 1.0)
    s.area_light.E = (120.0, 120.0, 120.0)
    s.area_light.size = (4.0, 4.0)
    r = Renderer(1920, 1080, settings=s, data_dir="data")
    r.load_scene(scene_path, env_map=ENV, use_saved_state=False)
    num_tasks = int(os.environ.get("BENCH_TASKS", str(1 << 20)))
    segments = int(os.environ.get("BENCH_ZOO_SEGMENTS", "24"))
    r.init_wavefront(num_tasks)
    r.render_wavefront(2)          # warmup/compile
    r.init_wavefront(num_tasks)
    t0 = time.time()
    r.render_wavefront(segments)
    elapsed = time.time() - t0
    st = r.wavefront_stats()
    rays = (int(st.primary_rays) + int(st.extension_rays)
            + int(st.shadow_rays))
    mrays = rays / (1e6 * elapsed)
    n_tris = r.scene.triangle_arrays()[0].shape[0]
    return {"metric": f"Mrays/s/chip, full material zoo "
                      f"({n_tris // 1000}k tris, 8 BXDF types) 1080p",
            "value": round(mrays, 2), "unit": "Mrays/s",
            "elapsed_s": round(elapsed, 3), "rays": rays,
            "segments": segments}


def _run_big(Renderer, Settings):
    """Second entry at conference scale (tracer.cpp:419-424 names
    conference ~331k tris; the .obj doesn't ship, so the 5x4 egyptcat grid
    at 320,520 tris stands in): supercluster traversal tier +
    HBM-streamed resolve at 1080p."""
    s = Settings()
    s.use_env_map = True
    s.use_area_light = True
    # BENCH_BIG_GRID=6x5 selects the ~481k-tri (country_kitchen scale)
    # composition; default 5x4 = 320k (conference scale)
    grid = os.environ.get("BENCH_BIG_GRID", "5x4")
    # egyptcat is a SEALED room (statue + shell); exterior viewpoints see
    # only box lids. Use the single-cat benchmark state camera/area-light
    # translated into one instance interior — conference, the reference
    # benchmark scene this stands in for, is an interior too
    # (tracer.cpp:419-424). Instance translations: make_bigscene.py grid.
    # BENCH_BIG_GRID=5x4_open selects the shell-stripped field of statues
    # (skipMaterials) with an EXTERIOR camera: every instance visible at
    # once, per-tile candidates span the whole supercluster table.
    if grid.endswith("_open"):
        s.use_area_light = False
        import math
        s.camera.pos = (30.0, 10.0, 62.0)
        nrm = math.sqrt(40.0**2 + 10.0**2 + 72.0**2)
        s.camera.dir = (-40.0 / nrm, -10.0 / nrm, -72.0 / nrm)
    else:
        tx, tz = (0.0, -11.5) if grid == "5x4" else (11.5, 0.0)
        s.camera.pos = (tx + 0.0, 1.0, tz + 3.5)
        s.camera.dir = (0.0, 0.0, -1.0)
        s.area_light.pos = (tx + 1.0, 1.0, tz + 0.0)
    r = Renderer(1920, 1080, settings=s, data_dir="data")
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
    rays = (int(st.primary_rays) + int(st.extension_rays)
            + int(st.shadow_rays))
    mrays = rays / (1e6 * elapsed)
    n_tris = r.scene.triangle_arrays()[0].shape[0]
    return {"metric": f"Mrays/s/chip, {grid} egyptcat grid "
                      f"({n_tris // 1000}k tris) 1080p",
            "value": round(mrays, 2), "unit": "Mrays/s",
            "elapsed_s": round(elapsed, 3), "rays": rays,
            "segments": segments}


if __name__ == "__main__":
    if os.environ.get("BENCH_WORKER") == "1":
        sys.exit(worker_main())
    sys.exit(supervise(sys.argv[1:]))
