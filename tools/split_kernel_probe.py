"""Does the full-frame fused kernel get the step-size effect?

The frameless sweep found 1024-tile dispatches run 0.96 us/tile vs
1.11 at 2048 (tools/stepsize_probe.py). The full-frame render issues
ONE 2040-tile dispatch — if the effect is dispatch-granularity (not
something about the progressive state scatter), splitting the frame's
kernel into two ~1020-tile dispatches should show the same per-tile
gain, worth ~0.5 ms/frame.

Interleaved in one process: (a) whole-frame fused kernel; (b) the
same tiles as TWO subset-kernel dispatches; (c) all tiles as ONE
subset dispatch (isolates indirect-map overhead from the split).

Usage: python tools/split_kernel_probe.py
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
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import (
    binned_pairs,
    camera_vector,
    trace_pairs_fused_soa,
    trace_pairs_fused_subset,
)

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
T = cfg.tiles_y * cfg.tiles_x
HALF = (T + 1) // 2
fresh = iter(range(1, 100000))


def fresh_scene():
    cam = dataclasses.replace(
        scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
    )
    return dataclasses.replace(scene0, camera=cam)


def make(variant, n):
    @jax.jit
    def run(scene):
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        pairs, starts, lens, _ = binned_pairs(scene, cfg, root, templates)
        cam0 = camera_vector(scene, cfg)
        ids_a = jnp.arange(HALF, dtype=jnp.int32)
        ids_b = jnp.arange(HALF, T, dtype=jnp.int32)
        ids_all = jnp.arange(T, dtype=jnp.int32)

        def body(acc, i):
            cam = cam0.at[11].add(1e-12 * i.astype(jnp.float32))
            if variant == "whole":
                out, _ = trace_pairs_fused_soa(cam, pairs, starts, lens, cfg)
                return acc + out[5, 0, 0, 0] + out[-1, 0, 0, 0], None
            if variant == "split2":
                o1, _ = trace_pairs_fused_subset(
                    cam, pairs, starts, lens, ids_a, cfg
                )
                o2, _ = trace_pairs_fused_subset(
                    cam, pairs, starts, lens, ids_b, cfg
                )
                return acc + o1[5, 0, 0, 0] + o2[-1, 0, 0, 0], None
            out, _ = trace_pairs_fused_subset(
                cam, pairs, starts, lens, ids_all, cfg
            )
            return acc + out[5, 0, 0, 0] + out[-1, 0, 0, 0], None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32)
        )
        return acc

    return run


def timed(fn):
    sc = fresh_scene()
    t0 = time.perf_counter()
    float(fn(sc))
    return time.perf_counter() - t0


def measure(variant):
    f2, f22 = make(variant, 2), make(variant, 22)
    timed(f2)
    timed(f22)
    trials = sorted((timed(f22) - timed(f2)) / 20 for _ in range(3))
    med = trials[1]
    print(f"{variant:8s}: {med * 1e3:6.2f} ms ({med / T * 1e6:.3f} us/tile; "
          f"trials {', '.join(f'{t * 1e3:.2f}' for t in trials)})",
          flush=True)
    return med


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    a = measure("whole")
    b = measure("split2")
    c = measure("subset1")
    a2 = measure("whole")
    print(f"\nwhole {min(a, a2) * 1e3:.2f} ms vs split2 {b * 1e3:.2f} "
          f"vs one-subset {c * 1e3:.2f}")


if __name__ == "__main__":
    main()
