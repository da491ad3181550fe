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
