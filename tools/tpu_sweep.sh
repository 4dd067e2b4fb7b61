#!/bin/bash
# One-shot TPU work queue for when the chip recovers.
# Ordered so the highest-value evidence lands first (a mid-sweep wedge
# should never erase the headline numbers again).
#
# RESUMABLE: each section records completion in data/sweep_logs/sections_done
# and is skipped on re-run, so a mid-sweep re-wedge only costs the section it
# interrupted. On detecting a re-wedge (entry produced a stale/failed result
# AND a fresh-process probe hangs) the sweep exits 99 immediately instead of
# burning every remaining entry's timeout; tools/tpu_watch.sh keeps re-running
# it until all sections are done.
#
# The log lives IN THE REPO (data/sweep_logs/) and evidence files are
# git-committed per section, so results survive even if the builder
# session is down when the chip comes back.
cd /root/repo
mkdir -p data/sweep_logs
DONE=data/sweep_logs/sections_done
touch $DONE
LOG=${SWEEP_LOG:-data/sweep_logs/sweep_$(date +%m%d_%H%M).log}
: > $LOG
ln -sf "$(basename $LOG)" data/sweep_logs/latest.log 2>/dev/null || true

say() { echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG; }

is_done() { grep -qx "$1" $DONE; }
mark_done() {
  echo "$1" >> $DONE
  git add data/sweep_logs tests/goldens gallery data/bench_last_good.json 2>/dev/null
  git commit -q -m "TPU sweep evidence: section $1" 2>/dev/null || true
}

probe_tpu() {
  # fresh bounded process; a wedged plugin must never poison this shell
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
EOF
}

bail_if_wedged() {
  if ! probe_tpu; then
    say "TPU re-wedged — aborting sweep (watcher will resume it)"
    git add data/sweep_logs 2>/dev/null
    git commit -q -m "TPU sweep evidence: partial (re-wedge)" 2>/dev/null || true
    exit 99
  fi
}

# e2e NAME TIMEOUT ENV... — a bench.py run is good iff it printed a
# non-stale parsed value (bench.py rc=0 even on its stale fallback line).
e2e() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "e2e $name: $*"
  local out
  out=$(timeout "$t" env BENCH_BIG=0 BENCH_SEGMENTS=24 "$@" python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q '"value": [0-9]' && ! echo "$out" | grep -q '"stale": true'; then
    mark_done "$name"
  else
    bail_if_wedged
    say "$name produced no fresh value but TPU probes alive — not retrying this pass"
  fi
}

# big NAME TIMEOUT ENV... — like e2e but checks the big_scene entry parsed.
big() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "big $name: $*"
  local out
  out=$(timeout "$t" env BENCH_SEGMENTS=8 "$@" python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q 'big_scene_320k.*"value": [0-9]' \
     && ! echo "$out" | grep -q '"error"'; then
    mark_done "$name"
  else
    bail_if_wedged
    say "$name failed but TPU probes alive — not retrying this pass"
  fi
}

# step NAME TIMEOUT CMD... — generic: good iff rc==0.
step() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "step $name: $*"
  local out rc
  out=$(timeout "$t" "$@" 2>&1); rc=$?
  echo "$out" | tail -8 | tee -a $LOG
  if [ "$rc" -eq 0 ]; then mark_done "$name"; else bail_if_wedged; fi
}

# trace NAME ENV... — isolated trace-kernel benchmark.
trace() {
  local name=$1; shift
  is_done "$name" && { say "skip $name (done)"; return; }
  say "trace $name: $*"
  local out
  out=$(timeout 900 env "$@" python tools/bench_trace.py 2>&1 | grep -E "closest|anyhit|hit rate")
  echo "$out" | tee -a $LOG
  if [ -n "$out" ]; then mark_done "$name"; else bail_if_wedged; fi
}

# 1. headline e2e first: baseline vs the staged round-3 levers
e2e e2e_rolv1               2400 FLT_ROL_V=1
e2e e2e_rolv4               2400 FLT_ROL_V=4
e2e e2e_rolv4_coarse        2400 FLT_ROL_V=4 FLT_ROL4_COARSE=1
e2e e2e_rolv4_nosort        2400 FLT_ROL_V=4 FLT_KEY=none
e2e e2e_rolv4_nosort_shoct  2400 FLT_ROL_V=4 FLT_KEY=none FLT_KEY_SHADOW=oct
e2e e2e_rolv1_nosort        2400 FLT_ROL_V=1 FLT_KEY=none

# 2. missing luxball golden (needs TPU 256-spp render) — verdict item 4
step golden_luxball 1800 python tools/make_goldens.py --only luxball

# 3. big-scene entries (supercluster path) — first real-TPU runs
big big_320k          2400 BENCH_BIG=1
big big_320k_sub      2400 BENCH_BIG=1 FLT_SC_SUB=1
big big_481k          3000 BENCH_BIG=1 BENCH_BIG_GRID=6x5
big big_320k_open     2400 BENCH_BIG=1 BENCH_BIG_GRID=5x4_open
big big_320k_open_sub 2400 BENCH_BIG=1 BENCH_BIG_GRID=5x4_open FLT_SC_SUB=1

# 4. isolated trace kernel: baseline vs rol4 configs
trace trace_rolv1          FLT_ROL_V=1
trace trace_rolv4_p4       FLT_ROL_V=4 FLT_PACK=4
trace trace_rolv4_p2       FLT_ROL_V=4 FLT_PACK=2
trace trace_rolv4_p8       FLT_ROL_V=4 FLT_PACK=8
trace trace_rolv4_t256     FLT_ROL_V=4 FLT_PACK=4 FLT_ROL_TILE=256
trace trace_rolv4_t128     FLT_ROL_V=4 FLT_PACK=4 FLT_ROL_TILE=128
trace trace_rolv4_coarse   FLT_ROL_V=4 FLT_PACK=4 FLT_ROL4_COARSE=1

# 5. hardware accuracy gates (verdict items 2+4)
# --rebaseline: a scene failing the tm gate but passing the mean-energy
# bias gate gets its independent-render noise floor measured (two
# FLT_SEED_SALT replicas); if the observed diff is within 1.3x the floor
# it is sample decorrelation (a round-4 numeric change decorrelated the
# chaotic egyptcat paths vs the Aug-17 golden), and the golden is
# regenerated with logged provenance. Floors land in
# tests/goldens/floors.json and calibrate future gates (VERDICT item 6).
step golden_check 3600 python tools/make_goldens.py --check --rebaseline
step sc_parity    1200 python tools/check_sc_parity.py
step sc_parity_big 1800 python tools/check_sc_parity.py \
    data/bigscene/big_egyptcat_5x4.sc.json --big

# 6. exact-spp tail vs free-running (verdict item 7): done bar ratio <= 1.3
step exact_tail 3000 python tools/bench_exact_tail.py

# 7. gallery at scale (verdict item 9): 320k + 481k PNG/CSV via .bm.json
step gallery_big 3000 python -m fluctus_tpu data/bigscene/bigscene.bm.json

# 8. final full-length DEFAULT-flags run: leaves data/bench_last_good.json
# holding the number the driver's own bench invocation will reproduce
is_done final_bench || {
  say "final default-config bench (full length, BENCH_BIG=1)"
  out=$(timeout 3600 python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q '"value": [0-9]' && ! echo "$out" | grep -q '"stale": true'; then
    mark_done final_bench
  fi
}

echo "SWEEP DONE $(date) ($(wc -l < $DONE) sections)" | tee -a $LOG
git add data/sweep_logs data/bench_last_good.json tests/goldens gallery 2>/dev/null
git commit -q -m "TPU sweep evidence: e2e flag A/Bs, big-scene numbers, goldens, last-good bench record" \
    2>/dev/null || true
