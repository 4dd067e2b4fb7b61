"""Kernel-level profiling — the analogue of the reference's CL event
profiling (CLContext::checkTracingPerf, clcontext.cpp:691-719), built on
jax.profiler traces.

Captures a device trace around a callable and reports per-op device time,
aggregated by HLO op, so isolated kernel cost (e.g. the MXU trace kernels
vs shading vs scatter/gather machinery) can be measured without the async
dispatch illusions this PJRT exhibits.
"""

from __future__ import annotations

import glob
import os
import tempfile
from collections import defaultdict
from typing import Callable, List, Tuple


def profile_device_ops(fn: Callable[[], None], trace_dir: str = None,
                       top: int = 25) -> List[Tuple[str, float, int]]:
    """Run fn() under a profiler trace; return [(op_name, total_ms, count)]
    sorted by device time, aggregated over the trace."""
    import jax

    trace_dir = trace_dir or tempfile.mkdtemp(prefix="flt_trace_")
    jax.profiler.start_trace(trace_dir)
    try:
        fn()
    finally:
        jax.profiler.stop_trace()

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        return []

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        return []
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())

    tot = defaultdict(float)
    cnt = defaultdict(int)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = names.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
    return [(name, ms, cnt[name]) for name, ms in items]


def print_profile(fn: Callable[[], None], top: int = 25):
    """checkTracingPerf-style console report."""
    rows = profile_device_ops(fn, top=top)
    print(f"{'ms total':>10} {'count':>6}  op")
    for name, ms, c in rows:
        print(f"{ms:10.2f} {c:6d}  {name[:100]}")
    return rows
