#!/usr/bin/env python
"""Exact-spp tail benchmark (round-3 verdict item 7).

Renders egyptcat at 1080p to an EXACT spp target through the wavefront
CHECK_SPP path (block pool + in-kernel multi-admit splat cap,
wf_logic.cl:76-84 / mk_splat.cl:21-34 semantics), instrumenting each
16-segment chunk with wall time and the fraction of pixels still below
target — then renders the same total sample count free-running.

Done bar (VERDICT r3 #7): exact wall time within 1.3x of free-running
for equal total samples. The tail breakdown shows whether the splat
cap's admit limit serializes deep-tail convergence.

Prints one JSON line:
  {"exact_s", "free_s", "ratio", "tail_s", "tail_chunks", "chunks",
   "exact_mrays", "free_mrays", "spp"}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCENE = "/root/reference/assets/egyptcat/egyptcat.obj"
ENV = "/root/reference/assets/env_maps/night.hdr"

SPP = int(os.environ.get("TAIL_SPP", "64"))
W = int(os.environ.get("TAIL_W", "1920"))
H = int(os.environ.get("TAIL_H", "1080"))
TASKS = int(os.environ.get("TAIL_TASKS", str(1 << 20)))
TAIL_AT = 0.05          # "tail" = chunks entered with <5% pixels remaining


def main():
    import jax
    # during an axon-tunnel wedge, JAX_PLATFORMS=cpu env-var init can
    # still hang probing the plugin; config.update before first backend
    # use is the reliable route (PERF.md round-3 findings)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from fluctus_tpu import compile_cache
    compile_cache.enable()
    import jax.numpy as jnp
    from fluctus_tpu.renderer import Renderer
    from fluctus_tpu.settings import Settings
    from fluctus_tpu.core.integrator_wf import (unpad_pixels, wf_reset,
                                                wf_segment)

    s = Settings()
    s.use_env_map = True
    s.wf_buffer_size = TASKS
    r = Renderer(W, H, settings=s, data_dir="data")
    r.load_scene(SCENE, env_map=ENV)

    # ---- exact run: same compiled program as render_single_wavefront,
    # re-driven here so each 16-segment chunk is timestamped
    cfg = r.config.replace(max_spp=1, use_roulette=False)
    if cfg.block_ring and TASKS % cfg.groups:
        cfg = cfg.replace(block_ring=False)
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))
    params = r.params._replace(max_spp=jnp.int32(SPP))

    state = wf_reset(cfg, TASKS, world_radius=r.world_radius)
    state, _ = step(r.device_scene, params, state, cfg)       # compile
    jax.block_until_ready(state.spp)

    state = wf_reset(cfg, TASKS, world_radius=r.world_radius)
    counters = []
    chunks = []                      # (chunk_seconds, frac_remaining_at_entry)
    frac_rem = 1.0
    t0 = time.time()
    while len(counters) < 100000:
        tc = time.time()
        for _ in range(16):
            state, c = step(r.device_scene, params, state, cfg)
            counters.append(c)
        spp = np.asarray(unpad_pixels(state.spp, cfg))
        now = time.time()
        chunks.append((now - tc, frac_rem))
        frac_rem = float((spp < SPP).mean())
        print(f"  chunk {len(chunks)}: {now - tc:.2f}s "
              f"remaining={frac_rem * 100:.2f}%", file=sys.stderr, flush=True)
        if frac_rem == 0.0:
            break
    exact_s = time.time() - t0
    flat = []
    for c in counters:
        flat.extend([c.raygen, c.extension, c.shadow])
    mat = np.asarray(jnp.stack(flat)).reshape(-1, 3).sum(0)
    exact_rays = int(mat[0]) + int(mat[1]) + int(mat[2])
    tail = [(dt, fr) for dt, fr in chunks if fr < TAIL_AT]
    total_samples = SPP * W * H

    # ---- free-running run, equal total samples
    r.init_wavefront(TASKS)
    r.render_wavefront(2)                                     # compile
    r.init_wavefront(TASKS)
    t0 = time.time()
    while int(r.wavefront_stats().samples) < total_samples:
        r.render_wavefront(8)
    free_s = time.time() - t0
    st = r.wavefront_stats()
    free_rays = (int(st.primary_rays) + int(st.extension_rays)
                 + int(st.shadow_rays))

    out = {
        "spp": SPP,
        "exact_s": round(exact_s, 2),
        "free_s": round(free_s, 2),
        "ratio": round(exact_s / max(free_s, 1e-9), 3),
        "tail_s": round(sum(dt for dt, _ in tail), 2),
        "tail_chunks": len(tail),
        "chunks": len(chunks),
        "exact_mrays": round(exact_rays / (1e6 * exact_s), 2),
        "free_mrays": round(free_rays / (1e6 * free_s), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
