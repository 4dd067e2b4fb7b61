"""Experiment-knob registry — the single place env overrides are read.

The reference bakes tuning decisions into kernels as compile-time defines
(clcontext.cpp:145-155, kernel_impl.hpp getAdditionalBuildOptions); our
analogue is static fields on ``geom.RenderConfig`` (retrace on change)
plus the module constants below. Env overrides exist ONLY for hardware
sweeps (tools/tpu_sweep.sh) and debugging: every production default must
cite a measurement in PERF.md, and a knob whose sweep verdict is in
loses its env override and becomes a plain constant (or is deleted with
its code path — see tools/SWEEP_ACTIONS.md).

Override names are ``FLT_<NAME>`` (e.g. ``FLT_ROL_V=4``). Values are read
through the helpers at the moment the consumer evaluates them: constants
annotated *import-time* freeze per process (sweeps run fresh processes);
*call-time* knobs may be monkeypatched in tests.

Knob inventory (defaults in parentheses):

  Trace-kernel generation / layout — ``accel/mxu_trace.py``
  (round-5 sweep executed the prune plan: rol2/rol3/rol4/sc3 kernel
  generations, the bal/dir sort keys and the v2 resolve were measured
  losers and are DELETED — see PERF.md round-5 sweep table; their
  ROL_V/PACK/FINE_SIZE/ROL4_COARSE/SC_SUB/RESOLVE_V knobs are gone):
    ROL ("1")            rays-on-lanes kernels vs sublane fallback [import]
    RAY_TILE (512)       rays per Pallas grid row [import]
    ROL_TILE (512)       rays per ROL tile (r2 measured optimum) [import]
    SC_CLUSTERS (64)     member clusters per supercluster [import]
    SC_THRESHOLD (96)    cluster count where the 2-level kernel engages
                         [import; call-time override honored at dispatch]
    SORT_RAYS ("1")      coherence sort before tiling [import]
    KEY ("oct")          ext-ray sort key: oct/none [call]
    KEY_SHADOW (=KEY)    shadow-ray override (occupancy cut needs a sort)
                         [call]
    PERM ("gather")      PAIR-path permutation machinery: "gather"
                         (default) sorts only (key, idx) and applies ONE
                         stacked [n,k] row-gather + inverse-perm unsort
                         (k pads to 128 lanes); "sort" carries payload
                         columns through lax.sort; "gather1" uses k
                         independent 1-D takes (no lane padding —
                         measured catastrophic, 5.90 Mrays/s).
                         Bit-identical results —
                         test_pair_sort.py::test_perm_gather_matches_sort;
                         hardware A/B: tools/bench_perm.py + r5/r5b sweep
                         (PAIR_SORT=1+gather 28.25/28.24 vs sort-carry
                         base 16.19 Mrays/s, PERF.md) [call]
    PERM_SINGLE ("sort") same machinery on the SINGLE-set sorted trace
                         (mk integrator, pick, shadow fallback). Default
                         stays "sort": gather on this path reproducibly
                         kernel-faults the TPU worker (PERF.md round-5
                         landmine; repro FLT_PERM_SINGLE=gather
                         FLT_PAIR_SORT=0 bench.py). Triage escape only
                         [call]
    PAIR_SORT ("1")      ext+shadow share ONE sort/unsort pair (14 sorted
                         columns in 2 programs vs 24 in 4; shadow rides
                         the ext order). With PERM=gather this is the
                         r5b-verified +75% default; with PERM=sort it
                         LOSES (13.78 vs 16.04 — the 15-operand sort
                         pays a real carry premium) [call]
    TILE_ORDER ("2")     per-tile candidate builder version [call]
    DIST_LO ("1")        box-box distance lower bound in tile culling
                         (r2: 2x on bounce tiles) [call]
    CAND_CAP (0)         diagnostic candidate-list truncation — NOT
                         correct, sweeps only [call]

  Wavefront host dispatch — ``renderer.py`` (measured r2/r3, PERF.md):
    BLOCK_RING ("1")     block-bound pixel pool (exact-spp block splat)
    WF_PHASES ("1")      trace/logic as separate programs (offload-op
                         contention; r2: fused serializes)
    WF_FUSED_SHADE ("1") shade fused into the logic program
    SPLAT_EVERY (1)      film-scatter batching K (r3: K=4 lost, 8.9 vs
                         9.9 — in-program scatter overlaps better)
    FORCE_MK ("0")       debug escape: mk megastep for render_single on
                         TPU instead of the exact-spp wavefront route

  Environment / process:
    FORCE_CPU ("0")      CLI: jax.config.update("jax_platforms","cpu")
                         before first backend use (wedge-safe, PERF.md)
    MULTIHOST ("0")      enable jax.distributed init (parallel/distributed)
    SEED_SALT (0)        decorrelated replica RNG stream for noise-floor
                         measurement (wf_reset; 0 = reference seed=gid
                         bit-exactly; used by make_goldens --floor /
                         --rebaseline) [call]
"""

from __future__ import annotations

import os

_PREFIX = "FLT_"


def env(name: str, default: str) -> str:
    """Raw override read: ``FLT_<name>`` or the registered default."""
    return os.environ.get(_PREFIX + name, default)


def env_int(name: str, default: int) -> int:
    return int(env(name, str(default)))


def env_bool(name: str, default: bool = True) -> bool:
    return env(name, "1" if default else "0") == "1"
