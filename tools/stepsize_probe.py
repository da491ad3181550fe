"""Sustained-refresh step-size sweep: per-ray cost of the frameless
step at different tiles-per-step (one process, interleaved — the only
trustworthy comparison on this tunnel). The bench uses 2048 (~one
frame's tiles); this probe checks whether per-step fixed costs
(Sobol draw, scatter setup, scan carry) reward bigger batches.

Usage: python tools/stepsize_probe.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.runtime.progressive import (
    progressive_prepare_trimmed,
    progressive_tiles_init,
    progressive_tiles_step,
)

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
fresh = iter(range(1, 100000))


def make(n, k):
    @jax.jit
    def run(scene):
        prepared = progressive_prepare_trimmed(scene, cfg)
        st = progressive_tiles_init(cfg, seed=0)

        def body(s, _):
            s = progressive_tiles_step(
                s, scene, cfg, tiles_per_step=k, prepared=prepared
            )
            return s, None

        st, _ = jax.lax.scan(body, st, None, length=n)
        return st.rows[5, 0, 0, 0] + st.closest_distance

    return run


def timed(fn):
    cam = dataclasses.replace(
        scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
    )
    sc = dataclasses.replace(scene0, camera=cam)
    t0 = time.perf_counter()
    float(fn(sc))
    return time.perf_counter() - t0


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    for k in (512, 1024, 2048, 4096):
        f2, f22 = make(2, k), make(22, k)
        timed(f2)
        timed(f22)
        trials = sorted((timed(f22) - timed(f2)) / 20 for _ in range(3))
        med = trials[1]
        print(
            f"tiles/step {k:5d}: {med * 1e3:6.2f} ms/step -> "
            f"{k * 1024 / med / 1e6:6.0f}M rays/s "
            f"({med / k * 1e6:.3f} us/tile; trials "
            f"{', '.join(f'{t * 1e3:.2f}' for t in trials)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
