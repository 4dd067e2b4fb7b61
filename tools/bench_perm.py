#!/usr/bin/env python
"""Isolated A/B of 1M-row permutation machinery on the real TPU.

The round-5 profile (PERF.md) attributes ~200 ms/seg of async S(1)
traffic to the coherence sorts' operand staging: each payload column of
a multi-operand ``lax.sort`` is staged HBM<->S(1) at ~4.5 ms per
f32[1M] (~0.9 GB/s — two orders under HBM speed). The trace path only
needs TILE-level grouping, so the payload carry could instead be:
sort (key, idx) alone (2 operands), then apply the permutation to the
ray columns with ONE stacked row-gather ([N,16] jnp.take) — if TPU
row-gather beats per-column sort staging, the 15-operand pair sort
(mxu_trace._sorted_trace_pair) shrinks to 2 sorted columns + 1 gather.

Measures (N = FLT_BENCH_N, default 1<<20):
  sort2        lax.sort (key, idx)                       — the floor
  sort8        lax.sort key + 7 payload columns          — current ext sort
  sort15       lax.sort key + 14 payload columns         — current pair sort
  gather16     one jnp.take of a stacked [N,16] f32 by a random perm
  gather13x1   13 per-column jnp.take (the rejected round-2 shape)
  scatter16    one [N,16] scatter by perm (unsort candidate)
  unsort3      lax.sort (sidx, t, col) — current unsort

Prints one line per variant: name, ms/run (median of 5 after warmup).
Timing fences via scalar value transfer (block_until_ready lies on this
PJRT — PERF.md round-2/round-5 notes)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from fluctus_tpu import compile_cache
    compile_cache.enable()

    n = int(os.environ.get("FLT_BENCH_N", str(1 << 20)))
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    cols = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(14)]
    stacked = jnp.stack(cols + [cols[0], cols[1]], axis=1)  # [N,16]
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    t_res = cols[0]
    c_res = key

    def fence(x):
        # scalar VALUE transfer — the only reliable sync on this PJRT
        return float(jnp.ravel(x)[0])

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        fence(out if not isinstance(out, (tuple, list)) else out[0])
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = f(*args)
            fence(out if not isinstance(out, (tuple, list)) else out[0])
            ts.append((time.time() - t0) * 1e3)
        print(f"{name:12s} {np.median(ts):8.2f} ms")

    timed("sort2", lambda k, i: jax.lax.sort((k, i), num_keys=1)[1],
          key, idx)
    timed("sort8", lambda k, i, *c: jax.lax.sort((k, i) + c,
                                                 num_keys=1)[1],
          key, idx, *cols[:6])
    timed("sort15", lambda k, i, *c: jax.lax.sort((k, i) + c,
                                                  num_keys=1)[1],
          key, idx, *cols[:13])
    timed("gather16", lambda a, p: jnp.take(a, p, axis=0), stacked, perm)
    timed("gather13x1",
          lambda p, *c: tuple(jnp.take(x, p) for x in c), perm, *cols[:13])
    timed("scatter16",
          lambda a, p: jnp.zeros_like(a).at[p].set(a), stacked, perm)
    timed("unsort3",
          lambda s, t, c: jax.lax.sort((s, t, c), num_keys=1)[1],
          perm, t_res, c_res)


if __name__ == "__main__":
    main()
