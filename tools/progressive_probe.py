"""Steady-state FRAMELESS progressive throughput on the real TPU —
the reference's defining mode (`README.md:8-10`, `Sphereflake.cpp:86-214`).

Measures samples/s of `progressive_step` with the pair table prepared
once (`progressive_prepare`, static camera — exactly the reference's
workers rereading a fixed view) vs re-binned every step, at 1080p
depth-6. Methodology: N steps inside ONE dispatch (lax.scan over the
carried ProgressiveState), marginal (t(22)-t(2))/20, value-fetch sync
(docs/PERF.md).

Usage: python tools/progressive_probe.py [batch_size]
"""
from __future__ import annotations

import dataclasses
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

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.runtime.progressive import (
    progressive_init,
    progressive_prepare,
    progressive_step,
)

scene0 = default_scene()


def main(batch=65536):
    cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                       tile_w=32, algorithm="binned")
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind} batch={batch}",
          file=sys.stderr)
    fresh = iter(range(1, 100000))

    def make_scan(n, use_prepared):
        @jax.jit
        def run(scene):
            state = progressive_init(cfg, seed=0)
            prepared = (
                progressive_prepare(scene, cfg) if use_prepared else None
            )

            def body(st, _):
                st = progressive_step(
                    st, scene, cfg, batch_size=batch, prepared=prepared
                )
                return st, None

            state, _ = jax.lax.scan(body, state, None, length=n)
            return state.min_t[5, 5] + state.closest_distance

        return run

    def run(fn):
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        sc = dataclasses.replace(scene0, camera=cam)
        t0 = time.perf_counter()
        float(fn(sc))
        return time.perf_counter() - t0

    for use_prepared in (True, False):
        f2, f22 = make_scan(2, use_prepared), make_scan(22, use_prepared)
        tc0 = time.perf_counter()
        run(f2)
        run(f22)
        tc = time.perf_counter() - tc0
        best = min((run(f22) - run(f2)) / 20 for _ in range(3))
        label = "sample/" + ("prep" if use_prepared else "rebin")
        print(
            f"{label:12s}: {best * 1e3:7.2f} ms/step = "
            f"{batch / best / 1e6:7.1f}M samples/s (compile {tc:.0f}s)",
            flush=True,
        )

    # Tile-granular frameless mode (the TPU-native refresh unit).
    from sphereflake_tpu.runtime.progressive import (
        progressive_tiles_init,
        progressive_tiles_step,
    )

    tiles_per_step = max(1, batch // 1024)

    def make_tile_scan(n):
        @jax.jit
        def run_t(scene):
            state = progressive_tiles_init(cfg, seed=0)
            prepared = progressive_prepare(scene, cfg)

            def body(st, _):
                st = progressive_tiles_step(
                    st, scene, cfg, tiles_per_step=tiles_per_step,
                    prepared=prepared,
                )
                return st, None

            state, _ = jax.lax.scan(body, state, None, length=n)
            return state.rows[5, 0, 0, 0] + state.closest_distance

        return run_t

    f2, f22 = make_tile_scan(2), make_tile_scan(22)
    tc0 = time.perf_counter()
    run(f2)
    run(f22)
    tc = time.perf_counter() - tc0
    best = min((run(f22) - run(f2)) / 20 for _ in range(3))
    rays = tiles_per_step * 1024
    print(
        f"{'tile/prep':12s}: {best * 1e3:7.2f} ms/step = "
        f"{rays / best / 1e6:7.1f}M samples/s "
        f"({tiles_per_step} tiles/step; compile {tc:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 65536)
