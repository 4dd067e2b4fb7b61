"""Persistent XLA compilation cache — the analogue of the reference's
on-disk kernel binary cache (clt::setKernelCacheDir("data/kernel_binaries"),
clcontext.cpp:23). TPU compiles here are expensive (remote toolchain);
caching makes re-runs start in seconds.
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str = "data/kernel_binaries"):
    global _enabled
    if _enabled:
        return
    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc
    os.makedirs(cache_dir, exist_ok=True)
    # NB: the config/env path does not initialize the cache under the axon
    # PJRT plugin; the explicit API does.
    cc.set_cache_dir(os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
