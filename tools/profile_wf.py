#!/usr/bin/env python
"""End-to-end wavefront-segment profile on the real TPU: per-op device time
for the bench workload (egyptcat 1080p), the analogue of the reference's
CLContext::checkTracingPerf breakdown."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np
    from fluctus_tpu import compile_cache
    compile_cache.enable()
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings
    from fluctus_tpu.profiling import print_profile

    s = Settings()
    s.use_env_map = True
    r = Renderer(1920, 1080, settings=s, data_dir="data")
    # PROF_SCENE=zoo profiles the 622k-tri full-material-zoo bench entry
    # (the slowest per-ray workload); default is the egyptcat headline.
    if os.environ.get("PROF_SCENE", "egyptcat") == "zoo":
        r.load_scene("data/bigscene/full_zoo.sc.json",
                     env_map="/root/reference/assets/env_maps/night.hdr")
    else:
        r.load_scene("/root/reference/assets/egyptcat/egyptcat.obj",
                     env_map="/root/reference/assets/env_maps/night.hdr")
    tasks = int(os.environ.get("BENCH_TASKS", str(1 << 20)))
    r.init_wavefront(tasks)
    r.render_wavefront(3)   # warmup + compile

    segs = int(os.environ.get("PROF_SEGS", "8"))
    t0 = time.time()
    r.render_wavefront(segs)
    dt = time.time() - t0
    st = r.wavefront_stats()
    tot = (int(st.primary_rays) + int(st.extension_rays)
           + int(st.shadow_rays))
    print(f"{segs} segments in {dt:.2f}s -> {dt/segs*1e3:.1f} ms/seg, "
          f"{tot/(1e6*dt):.1f} Mrays/s (incl. warmup rays in numerator? no: "
          f"counters cover warmup too — indicative only)")

    rows = print_profile(lambda: r.render_wavefront(segs), top=40)
    total_ms = sum(ms for _, ms, _ in rows)
    print(f"sum of top ops: {total_ms:.1f} ms over {segs} segments")


if __name__ == "__main__":
    main()
