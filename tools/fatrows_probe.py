"""Interleaved A/B: round-4 "thin" pair rows (5|6 rows, kernel derives
rc/rc4/lodr on the scalar unit) vs round-5 "fat" rows (7|8 rows, all
node-loop scalars precomputed in bin_nodes).

Hypothesis under test: the fused kernel's node loop is SCALAR-bound —
its measured ~1.7 us/tile matches the VPU 1-op/cycle estimate, but the
round-4 layout also runs ~15 scalar ops + a scalar sqrt per candidate,
which at ~1 scalar op/cycle rivals the ~24 vector ops. If true, fat
rows speed the kernel up to ~2x for zero DMA cost (the 5-row payload
was already padded to 8 rows for Mosaic's 8-row slice alignment).

Measures, all interleaved in ONE process (the tunnel drifts +-35%
across sessions — docs/PERF.md):
  1. sustained refresh step (2048-tile fused-subset dispatch, pairs
     prepared once) — the bench headline shape;
  2. full frame (expand + bin + fused kernel, camera moving) — the
     bench secondary metric.

Methodology per docs/PERF.md: N steps inside one dispatch (lax.scan
over per-step camera), marginal (t(22) - t(2)) / 20, value-fetch sync.

Usage: python tools/fatrows_probe.py
"""
from __future__ import annotations

import dataclasses
import importlib.util
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
from sphereflake_tpu.ops import binned as b_new

_spec = importlib.util.spec_from_file_location(
    "_binned_r4",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "_binned_r4.py"),
)
b_old = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(b_old)

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
T = cfg.tiles_y * cfg.tiles_x
TILES_PER_STEP = 2048
fresh = iter(range(1, 100000))


def fresh_scene():
    cam = dataclasses.replace(
        scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
    )
    return dataclasses.replace(scene0, camera=cam)


def timed(fn, sc):
    t0 = time.perf_counter()
    float(fn(sc))
    return time.perf_counter() - t0


def marginal(make, label):
    f2, f22 = make(2), make(22)
    tc0 = time.perf_counter()
    timed(f2, fresh_scene())
    timed(f22, fresh_scene())
    tc = time.perf_counter() - tc0
    trials = [
        (timed(f22, fresh_scene()) - timed(f2, fresh_scene())) / 20
        for _ in range(3)
    ]
    best = min(trials)
    print(
        f"{label:16s}: {best * 1e3:7.2f} ms/step "
        f"(trials {', '.join(f'{t * 1e3:.2f}' for t in trials)}; "
        f"compile {tc:.0f}s)",
        flush=True,
    )
    return best


def make_refresh(mod, n):
    """Sustained-step shape: fused-subset kernel over 2048 tiles, pairs
    prepared once outside the scan, per-step camera variation defeating
    loop-invariant hoisting."""
    from sphereflake_tpu.models.sphereflake import child_templates, root_frame

    @jax.jit
    def run(scene):
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        pairs, starts, lens, _ = mod.binned_pairs(
            scene, cfg, root, templates
        )
        cam0 = mod.camera_vector(scene, cfg)
        ids = jnp.arange(TILES_PER_STEP, dtype=jnp.int32) % T

        def body(acc, i):
            cam = cam0.at[11].add(1e-12 * i.astype(jnp.float32))
            out, _m = mod.trace_pairs_fused_subset(
                cam, pairs, starts, lens, ids, cfg
            )
            return acc + out[5, 0, 0, 0] + out[-1, 0, 0, 0], None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32)
        )
        return acc

    return run


def make_frames(mod, n):
    """Full-frame shape: expand + bin + fused kernel per frame, camera
    moving (the bench's frames() scan)."""

    @jax.jit
    def run(scene):
        def body(acc, i):
            fi = i.astype(jnp.float32)
            cam = dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 1e-7 * fi
            )
            sc = dataclasses.replace(scene, camera=cam)
            outs = mod.binned_gbuffer(
                (cfg, cfg.width, cfg.height, False), sc,
                (jnp.float32(0.0), jnp.float32(0.0)),
            )
            min_t = outs[0]
            return acc + min_t[5] + min_t[-5], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    return run


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    # Interleave old/new per shape so drift hits both equally.
    r_old = marginal(lambda n: make_refresh(b_old, n), "refresh/thin-r4")
    r_new = marginal(lambda n: make_refresh(b_new, n), "refresh/fat-r5")
    r_old2 = marginal(lambda n: make_refresh(b_old, n), "refresh/thin-r4")
    f_old = marginal(lambda n: make_frames(b_old, n), "frame/thin-r4")
    f_new = marginal(lambda n: make_frames(b_new, n), "frame/fat-r5")
    rays_step = TILES_PER_STEP * 1024
    rays_frame = cfg.width * cfg.height
    print(
        f"\nsustained: thin {rays_step / min(r_old, r_old2) / 1e6:.0f}M "
        f"-> fat {rays_step / r_new / 1e6:.0f}M rays/s "
        f"({min(r_old, r_old2) / r_new:.2f}x)"
    )
    print(
        f"full-frame: thin {rays_frame / f_old / 1e6:.0f}M "
        f"-> fat {rays_frame / f_new / 1e6:.0f}M rays/s "
        f"({f_old / f_new:.2f}x)"
    )


if __name__ == "__main__":
    main()
