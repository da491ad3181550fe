"""Microbenchmark TPU scatter variants for the bin_nodes fills.

Usage: python tools/scatter_probe.py
"""
from __future__ import annotations

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root for the package
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

N = 597871  # dense node count at depth 6
CAP = 1 << 18


def variants():
    def v_max_dup(slot, vals):
        # current: [CAP+1] target, dup dead slots, .max
        out = jnp.full((CAP + 1,), -1, jnp.int32).at[slot].max(vals[0])
        return out[:CAP]

    def v_set_unique(slot, vals):
        # unique in-bounds slots, OOB drops, .set
        out = jnp.full((CAP,), -1, jnp.int32).at[slot].set(
            vals[0], mode="drop", unique_indices=True
        )
        return out

    def v_set_unique4(slot, vals):
        # one batched scatter for all four fill sources
        out = jnp.full((4, CAP), -1, jnp.int32).at[:, slot].set(
            vals, mode="drop", unique_indices=True
        )
        return out[0] + out[1] + out[2] + out[3]

    def v_max4(slot, vals):
        out = jnp.full((4, CAP + 1), -1, jnp.int32).at[:, slot].max(vals)
        return out[:, 0].sum() + out[0, :CAP].max()

    return {
        "max_dup": v_max_dup,
        "set_uniq": v_set_unique,
        "set_uniq4": v_set_unique4,
        "max4": v_max4,
    }


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    fresh = iter(range(1, 100000))

    from functools import partial

    for name, fn in variants().items():
        @partial(jax.jit, static_argnames=("n",))
        def frames(seed, n, fn=fn):
            def body(acc, i):
                # fresh pseudo-slots each iteration (monotone-ish like first)
                base = jnp.arange(N, dtype=jnp.int32)
                slot = jnp.where(
                    (base + seed + i) % 5 == 0,
                    jnp.minimum(base // 2, CAP - 1),
                    CAP,
                )
                vals = jnp.stack([base + i, base + 1, base + 2, base + 3])
                r = fn(slot, vals)
                return acc + jnp.sum(r[:8] if r.ndim else r) * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc

        def run(n):
            s = jnp.int32(next(fresh))
            t0 = time.perf_counter()
            float(frames(s, n))
            return time.perf_counter() - t0

        run(2)
        run(22)
        best = min((run(22) - run(2)) / 20 for _ in range(2))
        print(f"{name:10s}: {best * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
