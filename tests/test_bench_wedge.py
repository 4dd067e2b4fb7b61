"""bench.py wedge resilience: a wedged TPU init on the first attempt must
not erase the run — the supervisor retries in a fresh process, and if every
attempt wedges it still prints a parsed line carrying the last good value.

Reference analogue: CLT's device-selection retry loop
(/root/reference/src/clcontext.cpp:18-42)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(tmp_path, sim_wedge, budget="60"):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "BENCH_FAKE": "1",                 # skip the real render
        "BENCH_SIM_WEDGE": str(sim_wedge),
        "BENCH_ATTEMPT_INIT_TIMEOUT": "3",
        "BENCH_RETRY_BACKOFF": "1",
        "BENCH_INIT_TIMEOUT": budget,
        "BENCH_LAST_GOOD": str(tmp_path / "last_good.json"),
    })
    env.pop("BENCH_WORKER", None)
    env.pop("BENCH_SIM_WEDGE_NOW", None)
    return subprocess.run([sys.executable, BENCH], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True, timeout=120)


def _last_json_line(stdout):
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in: {stdout!r}"
    return json.loads(lines[-1])


def test_wedged_first_attempt_still_yields_parsed_line(tmp_path):
    proc = _run(tmp_path, sim_wedge=1)
    assert proc.returncode == 0, proc.stderr[-500:]
    out = _last_json_line(proc.stdout)
    assert out["value"] == 1.0
    assert "stale" not in out
    assert "retrying" in proc.stderr
    # a successful run records itself as the new last-good value
    rec = json.load(open(tmp_path / "last_good.json"))
    assert rec["value"] == 1.0 and "recorded_unix" in rec


def test_all_attempts_wedged_emits_last_good(tmp_path):
    (tmp_path / "last_good.json").write_text(json.dumps(
        {"metric": "Mrays/s/chip (traverse+shade), egyptcat 1080p",
         "value": 16.3, "unit": "Mrays/s", "vs_baseline": 0.0815}))
    proc = _run(tmp_path, sim_wedge=99, budget="8")
    assert proc.returncode == 0, proc.stderr[-500:]
    out = _last_json_line(proc.stdout)
    assert out["stale"] is True
    assert out["value"] == 16.3
    assert "STALE" in out["metric"]
    assert out["last_good"]["value"] == 16.3
    assert "error" in out


def test_all_attempts_wedged_no_last_good_falls_back_to_bench_artifacts(
        tmp_path):
    # no dedicated record: falls back to the newest committed BENCH_r*.json
    # with a parsed value (r02 = 9.01 as of round 3)
    proc = _run(tmp_path, sim_wedge=99, budget="8")
    out = _last_json_line(proc.stdout)
    assert out["stale"] is True
    assert out["value"] is not None
    assert out["last_good"]["source"].startswith("BENCH_r")
