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


def test_supervisor_sigterm_kills_worker(tmp_path):
    """`timeout` signals only the supervisor; it must take the worker down
    with it (a timed-out sweep entry must not orphan a TPU-holding
    worker)."""
    import signal
    import time

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "BENCH_FAKE": "1",
        "BENCH_SIM_WEDGE": "1",            # worker hangs in the sim sleep
        "BENCH_ATTEMPT_INIT_TIMEOUT": "60",
        "BENCH_INIT_TIMEOUT": "90",
        "BENCH_LAST_GOOD": str(tmp_path / "lg.json"),
    })
    env.pop("BENCH_WORKER", None)
    env.pop("BENCH_SIM_WEDGE_NOW", None)
    sup = subprocess.Popen([sys.executable, BENCH], env=env,
                           stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    time.sleep(8)                          # let it spawn the worker
    sup.send_signal(signal.SIGTERM)
    sup.wait(timeout=15)
    assert sup.returncode == 124
    # the worker (child of the supervisor) must be gone shortly after
    deadline = time.time() + 10
    while time.time() < deadline:
        kids = [p for p in os.listdir("/proc") if p.isdigit()
                and _ppid(p) == sup.pid]
        if not kids:
            break
        time.sleep(0.5)
    assert not kids, f"orphaned worker(s): {kids}"


def _ppid(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            return int(f.read().split(")")[-1].split()[1])
    except (OSError, ValueError, IndexError):
        return -1
