#!/bin/bash
# One-shot TPU work queue for when the chip recovers.
cd /root/repo
LOG=${SWEEP_LOG:-/tmp/tpu_sweep.log}
: > $LOG
say() { echo "=== $*" | tee -a $LOG; }
run() { say "$*"; timeout 900 env "$@" python tools/bench_trace.py 2>&1 | grep -E "closest|anyhit|hit rate" | tee -a $LOG; }

# 1. isolated trace kernel: baseline vs rol4 configs
run FLT_ROL_V=1
run FLT_ROL_V=4 FLT_PACK=4
run FLT_ROL_V=4 FLT_PACK=2
run FLT_ROL_V=4 FLT_PACK=8
run FLT_ROL_V=4 FLT_PACK=4 FLT_ROL_TILE=256
run FLT_ROL_V=4 FLT_PACK=4 FLT_ROL_TILE=128
run FLT_ROL_V=4 FLT_PACK=4 FLT_ROL4_COARSE=1

# 2. end-to-end A/Bs (egyptcat 1080p, 24 segments)
say "e2e ROL_V=1 baseline"
timeout 1800 env BENCH_BIG=0 BENCH_SEGMENTS=24 FLT_ROL_V=1 python bench.py 2>/dev/null | tee -a $LOG
say "e2e ROL_V=4"
timeout 1800 env BENCH_BIG=0 BENCH_SEGMENTS=24 FLT_ROL_V=4 python bench.py 2>/dev/null | tee -a $LOG
say "e2e ROL_V=4 + coarse-expanded candidates"
timeout 1800 env BENCH_BIG=0 BENCH_SEGMENTS=24 FLT_ROL_V=4 FLT_ROL4_COARSE=1 python bench.py 2>/dev/null | tee -a $LOG
say "e2e ROL_V=4 + no-sort (block-ring lane order)"
timeout 1800 env BENCH_BIG=0 BENCH_SEGMENTS=24 FLT_ROL_V=4 FLT_KEY=none python bench.py 2>/dev/null | tee -a $LOG
say "e2e ROL_V=4 + no-sort ext, sorted shadows"
timeout 1800 env BENCH_BIG=0 BENCH_SEGMENTS=24 FLT_ROL_V=4 FLT_KEY=none FLT_KEY_SHADOW=oct python bench.py 2>/dev/null | tee -a $LOG
say "e2e ROL_V=1 + no-sort"
timeout 1800 env BENCH_BIG=0 BENCH_SEGMENTS=24 FLT_ROL_V=1 FLT_KEY=none python bench.py 2>/dev/null | tee -a $LOG

# 3. big-scene entry (320k supercluster path) — first real-TPU run
say "big scene 320k (conference scale)"
timeout 2400 env BENCH_BIG=1 BENCH_SEGMENTS=8 python bench.py 2>/dev/null | tee -a $LOG
say "big scene 320k + FLT_SC_SUB=1 (in-cluster sub-block culling)"
timeout 2400 env BENCH_BIG=1 BENCH_SEGMENTS=8 FLT_SC_SUB=1 python bench.py 2>/dev/null | tee -a $LOG

echo done | tee -a $LOG

# 4. missing luxball golden (needs TPU 256-spp render)
say "luxball golden"
timeout 1800 python tools/make_goldens.py --only luxball 2>&1 | tail -3 | tee -a $LOG
