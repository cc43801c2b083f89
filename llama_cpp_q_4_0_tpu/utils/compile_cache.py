"""Persistent XLA compile cache for scripts and benchmarks.

tests/conftest.py enables this for the suite; bench.py and scripts/ call
enable() so repeated 7B jit compiles (~40-370 s cold on a 1-CPU host) are
paid once per kernel variant, not once per process.  Safe to call any
time before the first compilation."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
