"""Test environment: force CPU with 8 virtual devices.

This makes mesh/sharding/collective tests (SURVEY §4 "Distributed")
runnable anywhere — the driver separately dry-runs the multi-chip path on
a virtual device mesh, and `bench.py` is the only entry point meant to
claim the real TPU.

The environment's sitecustomize registers the `axon` TPU plugin and
force-sets ``jax_platforms="axon,cpu"`` via jax.config at interpreter
start (overriding the JAX_PLATFORMS env var), so we must override back
through jax.config *after* importing jax, before any backend initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles ~100 sizeable XLA
# programs (shard_map meshes, interpret-mode kernels); caching them on
# disk cuts re-runs from tens of minutes to a few.
_cache = os.path.expanduser(
    os.environ.get("SPHEREFLAKE_TEST_CACHE", "~/.cache/jax-testcache")
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop in-memory compiled executables between test modules: a
    50-minute single-process run accumulated enough XLA state to
    segfault the CPU compiler around the 95th test."""
    yield
    jax.clear_caches()
