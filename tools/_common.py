"""Shared helpers for the perf tools.

Timing on the tunneled TPU (axon backend) has two traps that invalidate
naive methodology:

1. ``block_until_ready`` can return before device execution completes —
   only fetching a result VALUE actually synchronizes.
2. The relay memoizes identical (executable, inputs) dispatches, so any
   repeat call with the same inputs returns a cached result in ~0.1 ms.

Hence every reliable probe here (a) runs its frames inside ONE dispatch
via ``lax.scan``, (b) feeds fresh parameter values per call, and (c)
times a scalar value fetch.
"""
from __future__ import annotations

import os


def setup_cache() -> str:
    """Point JAX at a persistent compilation cache (env-overridable)."""
    cache = os.path.expanduser(
        os.environ.get("SPHEREFLAKE_CACHE_DIR", "~/.cache/jax-bench")
    )
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache
