#!/bin/bash
# Round-5 follow-up queue — runs AFTER tools/tpu_sweep.sh completes
# (tools/tpu_watch.sh exits at 25 sections). Same resumable protocol:
# per-section done-file entries + git-committed evidence.
#
# Sections:
#   1. pair-sort e2e A/B (FLT_PAIR_SORT=1 vs default) — the round-5
#      sort-operand-reduction lever (PERF.md round-5 profile)
#   2. re-measure big_481k + full_zoo with the fixed timing fence
#      (renderer.py: block_until_ready lies on this PJRT; first-run
#      numbers 288/3320 Mrays/s in sweep_0819 were dispatch-time only)
#   3. fresh per-op profile under the winner config
cd /root/repo
mkdir -p data/sweep_logs
DONE=data/sweep_logs/sections_done
touch $DONE
LOG=${SWEEP_LOG:-data/sweep_logs/sweep_r5_$(date +%m%d_%H%M).log}
: > $LOG
ln -sf "$(basename $LOG)" data/sweep_logs/latest_r5.log 2>/dev/null || true

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
    say "TPU re-wedged — aborting r5 sweep"
    git add data/sweep_logs 2>/dev/null
    git commit -q -m "TPU sweep evidence: r5 partial (re-wedge)" 2>/dev/null || true
    exit 99
  fi
}
e2e() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "e2e $name: $*"
  local out
  out=$(timeout "$t" env BENCH_BIG=0 BENCH_ZOO=0 BENCH_SEGMENTS=24 "$@" python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  if echo "$out" | grep -q '"value": [0-9]' && ! echo "$out" | grep -q '"stale": true'; then
    mark_done "$name"
  else
    bail_if_wedged
    say "$name produced no fresh value but TPU probes alive"
  fi
}
step() {
  local name=$1 t=$2; shift 2
  is_done "$name" && { say "skip $name (done)"; return; }
  say "step $name: $*"
  local out rc
  out=$(timeout "$t" "$@" 2>&1); rc=$?
  echo "$out" | tail -12 | tee -a $LOG
  if [ "$rc" -eq 0 ]; then mark_done "$name"; else bail_if_wedged; fi
}

# 0. permutation-machinery microbench (cheapest, decides the next sort
# redesign: sort-carry vs stacked row-gather — PERF.md round-5 profile)
step perm_bench 1200 python tools/bench_perm.py

# 1. pair-sort / perm-machinery A/Bs (identical settings, one flag each)
e2e e2e_r5_base        2400
e2e e2e_r5_pairsort    2400 FLT_PAIR_SORT=1
e2e e2e_r5_permgather  2400 FLT_PERM=gather
e2e e2e_r5_permgather1 2400 FLT_PERM=gather1
e2e e2e_r5_pair_gather 2400 FLT_PAIR_SORT=1 FLT_PERM=gather

# 2. re-measure the timing-artifact entries (big 481k, full zoo)
is_done big_r5_481k || {
  say "big_r5_481k (fixed timing fence)"
  out=$(timeout 3000 env BENCH_ZOO=0 BENCH_BIG=1 BENCH_BIG_GRID=6x5 python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  echo "$out" | grep -q 'big_scene_320k.*"value": [0-9]' && ! echo "$out" | grep -q '"error"' \
    && mark_done big_r5_481k || bail_if_wedged
}
is_done zoo_r5 || {
  say "zoo_r5 (fixed timing fence)"
  out=$(timeout 3000 env BENCH_BIG=0 BENCH_ZOO=1 python bench.py 2>/dev/null)
  echo "$out" | tee -a $LOG
  echo "$out" | grep -q 'full_zoo_500k.*"value": [0-9]' && ! echo "$out" | grep -q 'full_zoo_500k.*error' \
    && mark_done zoo_r5 || bail_if_wedged
}

# 3. per-op profile under the pair-sort winner (decided by 1)
step profile_r5_pair 1800 env FLT_PAIR_SORT=1 python tools/profile_wf.py

# 4. full_zoo golden + cross-integrator parity (verdict item 4 done-bar)
step golden_fullzoo 2400 python tools/make_goldens.py --only full_zoo
step zoo_parity     2400 python tools/check_zoo_parity.py
is_done golden_fullzoo && {
  git add tests/goldens 2>/dev/null
  git commit -q -m "full_zoo 256-spp TPU golden" 2>/dev/null || true
}

# 5. measure the remaining milestones' independent-render noise floors
# (VERDICT item 6 done-bar: every gate <= 1.3x its measured floor —
# egyptcat's landed with the rebaseline; these TIGHTEN the low-noise
# scenes below the 1e-2 default). full_zoo floor deferred: 2x256spp of
# 622k tris; its bias gate is zoo_parity.
step golden_floors 5400 bash -c 'for s in teapot_diffuse teapot_dielectric gold_rings luxball; do python tools/make_goldens.py --floor --only $s || exit 1; done'

# 6. goldens re-check on the pruned tree (the 17:11 mid-prune egyptcat
# FAIL needs a clean-tree verdict; cheap — reuses cached compiles)
step goldens_check_r5 3600 python tools/make_goldens.py --check --rebaseline

echo "R5 SWEEP DONE $(date)" | tee -a $LOG
git add data/sweep_logs data/bench_last_good.json 2>/dev/null
git commit -q -m "TPU sweep evidence: round-5 pair-sort A/B + re-measured big/zoo entries" 2>/dev/null || true
