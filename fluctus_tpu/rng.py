"""Counter-based per-path RNG.

The reference keeps one mutable uint32 seed per path and advances it through
Bob Jenkins' ("Burtle") integer hash on every draw (src/random.cl:7-22). That
scheme is already counter-based and therefore vectorizes perfectly on TPU: the
seed lives in the path-state SoA and every ``rand`` is a handful of VPU integer
ops. We reproduce the exact hash so sample sequences are distributionally
identical to the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

ONE_4294967296 = jnp.float32(2.3283064365386963e-10)  # 1 / 2^32 (geom.h:16)


def burtle_hash(seed: jnp.ndarray) -> jnp.ndarray:
    """Bob Jenkins integer hash (src/random.cl:7-15). seed: uint32 array."""
    seed = jnp.asarray(seed, jnp.uint32)
    seed = (seed ^ jnp.uint32(61)) ^ (seed >> 16)
    seed = seed * jnp.uint32(9)
    seed = seed ^ (seed >> 4)
    seed = seed * jnp.uint32(0x27D4EB2D)
    seed = seed ^ (seed >> 15)
    return seed


def rand(seed: jnp.ndarray):
    """Advance seed, return (u, new_seed) with u in [0, 1) (src/random.cl:18-22).

    The uniform is built from the hash's top 23 bits via exponent-bit
    splicing rather than the reference's uint->float multiply: numerically
    equivalent for rendering (float32 keeps ~24 bits either way), and the
    fused u32-convert pattern destabilizes the TPU runtime (measured: it
    permanently degrades dispatch latency ~300x for the process).
    """
    import jax.lax as lax
    seed = burtle_hash(seed)
    mant = (seed >> 9) | jnp.uint32(0x3F800000)
    u = lax.bitcast_convert_type(mant, jnp.float32) - 1.0
    return u, seed


def rand_n(seed: jnp.ndarray, n: int):
    """Draw n sequential values; returns (list of arrays, new_seed)."""
    outs = []
    for _ in range(n):
        u, seed = rand(seed)
        outs.append(u)
    return outs, seed
