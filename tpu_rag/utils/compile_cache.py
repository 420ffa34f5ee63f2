"""Persistent XLA compilation cache.

First TPU compiles are expensive (and on tunneled/remote-compile setups,
flaky); caching compiled executables on disk makes server restarts and
repeated bench runs fast.  Call early, before the first jit execution.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    cache_dir = path or os.getenv("JAX_COMPILATION_CACHE_DIR") or "/tmp/tpu_rag_jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
