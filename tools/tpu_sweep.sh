#!/bin/bash
# One-shot TPU work queue for when the chip recovers.
# Ordered so the highest-value evidence lands first (a mid-sweep wedge
# should never erase the headline numbers again).
# The log lives IN THE REPO (data/sweep_logs/) and the script ends with a
# git commit of the evidence files, so results survive even if the builder
# session is down when the chip comes back.
cd /root/repo
mkdir -p data/sweep_logs
LOG=${SWEEP_LOG:-data/sweep_logs/sweep_$(date +%m%d_%H%M).log}
: > $LOG
ln -sf "$(basename $LOG)" data/sweep_logs/latest.log 2>/dev/null || true
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a $LOG; }
run() { say "$*"; timeout 900 env "$@" python tools/bench_trace.py 2>&1 | grep -E "closest|anyhit|hit rate" | tee -a $LOG; }
e2e() { local t=$1; shift; say "e2e $*"; timeout $t env BENCH_BIG=0 BENCH_SEGMENTS=24 "$@" python bench.py 2>/dev/null | tee -a $LOG; }

# 1. headline e2e first: baseline vs the staged round-3 levers
e2e 2400 FLT_ROL_V=1
e2e 2400 FLT_ROL_V=4
e2e 2400 FLT_ROL_V=4 FLT_ROL4_COARSE=1
e2e 2400 FLT_ROL_V=4 FLT_KEY=none
e2e 2400 FLT_ROL_V=4 FLT_KEY=none FLT_KEY_SHADOW=oct
e2e 2400 FLT_ROL_V=1 FLT_KEY=none

# 2. missing luxball golden (needs TPU 256-spp render) — verdict item 4
say "luxball golden"
timeout 1800 python tools/make_goldens.py --only luxball 2>&1 | tail -3 | tee -a $LOG

# 3. big-scene entry (320k supercluster path) — first real-TPU run
say "big scene 320k (conference scale)"
timeout 2400 env BENCH_BIG=1 BENCH_SEGMENTS=8 python bench.py 2>/dev/null | tee -a $LOG
say "big scene 320k + FLT_SC_SUB=1 (in-cluster sub-block culling)"
timeout 2400 env BENCH_BIG=1 BENCH_SEGMENTS=8 FLT_SC_SUB=1 python bench.py 2>/dev/null | tee -a $LOG
say "big scene 481k (country_kitchen scale)"
timeout 3000 env BENCH_BIG=1 BENCH_SEGMENTS=8 BENCH_BIG_GRID=6x5 python bench.py 2>/dev/null | tee -a $LOG
say "big scene 320k OPEN FIELD (exterior camera, candidates span all superclusters)"
timeout 2400 env BENCH_BIG=1 BENCH_SEGMENTS=8 BENCH_BIG_GRID=5x4_open python bench.py 2>/dev/null | tee -a $LOG
say "big scene 320k OPEN FIELD + FLT_SC_SUB=1"
timeout 2400 env BENCH_BIG=1 BENCH_SEGMENTS=8 BENCH_BIG_GRID=5x4_open FLT_SC_SUB=1 python bench.py 2>/dev/null | tee -a $LOG

# 4. isolated trace kernel: baseline vs rol4 configs
run FLT_ROL_V=1
run FLT_ROL_V=4 FLT_PACK=4
run FLT_ROL_V=4 FLT_PACK=2
run FLT_ROL_V=4 FLT_PACK=8
run FLT_ROL_V=4 FLT_PACK=4 FLT_ROL_TILE=256
run FLT_ROL_V=4 FLT_PACK=4 FLT_ROL_TILE=128
run FLT_ROL_V=4 FLT_PACK=4 FLT_ROL4_COARSE=1

# 5. hardware accuracy gates (verdict items 2+4)
say "golden --check (1e-2 RMSE gate on TPU)"
timeout 2400 python tools/make_goldens.py --check 2>&1 | tail -8 | tee -a $LOG
say "sc parity on hardware (flat vs forced supercluster, egyptcat)"
timeout 1200 python tools/check_sc_parity.py 2>&1 | tail -5 | tee -a $LOG
say "sc parity on hardware (sampled-ray parity vs bitstack, 320k)"
timeout 1800 python tools/check_sc_parity.py \
    data/bigscene/big_egyptcat_5x4.sc.json --big 2>&1 | tail -6 | tee -a $LOG

# 6. exact-spp tail vs free-running (verdict item 7): done bar ratio <= 1.3
say "exact-spp tail benchmark (egyptcat 1080p, 64 spp)"
timeout 3000 python tools/bench_exact_tail.py 2>/dev/null | tee -a $LOG

# 7. gallery at scale (verdict item 9): 320k + 481k PNG/CSV via .bm.json
say "big-scene gallery renders (.bm.json harness)"
timeout 3000 python -m fluctus_tpu data/bigscene/bigscene.bm.json 2>&1 | tail -4 | tee -a $LOG

# 8. final full-length DEFAULT-flags run: leaves data/bench_last_good.json
# holding the number the driver's own bench invocation will reproduce
say "final default-config bench (full length, BENCH_BIG=1)"
timeout 3600 python bench.py 2>/dev/null | tee -a $LOG

echo "SWEEP DONE $(date)" | tee -a $LOG

# Persist the evidence even if no builder session is alive right now:
# the driver only snapshots committed/working-tree repo files.
git add data/sweep_logs data/bench_last_good.json tests/goldens \
        gallery 2>/dev/null
git commit -q -m "TPU sweep evidence: e2e flag A/Bs, big-scene numbers, goldens, last-good bench record" \
    2>/dev/null || true
