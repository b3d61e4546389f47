"""Persistent XLA compilation cache.

On the tunneled TPU platform a fresh program compile costs minutes, and the
codec uses a small closed set of bucketed shapes -- caching compiled
executables on disk makes every run after the first start instantly.
Called lazily by the device codec modules (encoder_jax / decoder_jax /
parallel.shard / bench) before their first jit dispatch.
"""
from __future__ import annotations

import os

_done = False


def ensure_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get(
            "XSI_JAX_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "xsi_jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail the codec over it
