#!/bin/bash
# Round-5 wrap-up queue — runs AFTER tools/tpu_sweep_r5.sh. The r5 A/Bs
# decided the sort-machinery levers (pair_sort LOST 13.78 vs 16.04;
# perm gather/gather1 per the e2e rows in latest_r5.log); this queue
# banks the decision-quality evidence that section 3 of r5 missed:
#   - per-op profile under the TRUE default config (profile_r5_pair ran
#     under FLT_PAIR_SORT=1, which lost)
#   - a fresh full-length default-flags bench -> data/bench_last_good.json
cd /root/repo
mkdir -p data/sweep_logs
DONE=data/sweep_logs/sections_done
touch $DONE
LOG=${SWEEP_LOG:-data/sweep_logs/sweep_r5b_$(date +%m%d_%H%M).log}
: > $LOG
ln -sf "$(basename $LOG)" data/sweep_logs/latest_r5b.log 2>/dev/null || true

say() { echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG; }
is_done() { grep -qx "$1" $DONE; }
mark_done() {
  echo "$1" >> $DONE
  git add data/sweep_logs data/bench_last_good.json tests/goldens 2>/dev/null
  git commit -q -m "TPU sweep evidence: section $1" 2>/dev/null || true
}
probe_tpu() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
EOF
}
bail_if_wedged() {
  if ! probe_tpu; then
    say "TPU re-wedged — aborting r5b sweep (resume by re-running)"
    git add data/sweep_logs 2>/dev/null
    git commit -q -m "TPU sweep evidence: r5b partial (re-wedge)" 2>/dev/null || true
    exit 99
  fi
}
step() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "step $name: $*"
  local out rc
  out=$(timeout "$t" "$@" 2>&1); rc=$?
  echo "$out" | tail -45 | tee -a $LOG
  if [ "$rc" -eq 0 ]; then mark_done "$name"; else bail_if_wedged; fi
}

e2e() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "e2e $name: $*"
  local out
  out=$(timeout "$t" env BENCH_BIG=0 BENCH_ZOO=0 BENCH_SEGMENTS=24 "$@" python bench.py 2>/tmp/bench_err_$name.log)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q '"value": [0-9]' && ! echo "$out" | grep -q '"stale": true'; then
    mark_done "$name"
  else
    tail -6 /tmp/bench_err_$name.log | tee -a $LOG
    bail_if_wedged
    say "$name produced no fresh value but TPU probes alive"
  fi
}

# 0. VERIFY the 28.21 Mrays/s pair_gather reading (76% over base) with
# two repeats + a base repeat, all compile-cached now. ±5% run-to-run
# is normal (PERF.md); a one-off 1.76x is not trusted until repeated.
e2e e2e_r5_pair_gather_v2 2400 FLT_PAIR_SORT=1 FLT_PERM=gather
e2e e2e_r5_pair_gather_v3 2400 FLT_PAIR_SORT=1 FLT_PERM=gather
e2e e2e_r5_base_v2        2400

# 0b. the standalone-gather bench crashed rc=1 (suspected OOM from the
# 128-lane-padded [1M,k] stacks x2 programs); capture stderr this time
e2e e2e_r5_permgather_err 2400 FLT_PERM=gather

# 1. per-op profile under the TRUE defaults (decision basis for any
# remaining shade-phase work: the r5 profile ran under the losing
# pair-sort config)
step profile_r5_default 1800 python tools/profile_wf.py

# 1b. per-op profile under the pair_gather candidate (only meaningful
# if section 0 verified it; cheap either way)
step profile_r5_pair_gather 1800 env FLT_PAIR_SORT=1 FLT_PERM=gather python tools/profile_wf.py

# 1c. zoo parity with the TRUE mk integrator: the r5 zoo_parity run
# compared wavefront to wavefront (render_single routes to the exact-spp
# wavefront on TPU) and printed a vacuous rmse 0.0000; the tool now
# forces FLT_FORCE_MK=1 for the second arm and asserts non-identity.
# mk megastep compile at depth 8 is minutes (unrolled bounce loop).
step zoo_parity_mk 3000 python tools/check_zoo_parity.py

# 2. final full-length default-flags bench: refreshes
# data/bench_last_good.json with the shipping config's number
is_done final_bench_r5 || {
  say "final default-config bench (full length, BENCH_BIG=1 BENCH_ZOO=1)"
  out=$(timeout 3600 python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q '"value": [0-9]' && ! echo "$out" | grep -q '"stale": true'; then
    mark_done final_bench_r5
  else
    bail_if_wedged
  fi
}

echo "R5B SWEEP DONE $(date)" | tee -a $LOG
git add data/sweep_logs data/bench_last_good.json 2>/dev/null
git commit -q -m "TPU sweep evidence: r5b default-config profile + final bench" 2>/dev/null || true
