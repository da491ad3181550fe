"""Projected multi-chip scaling efficiency, measured on ONE real chip.

The forward render is embarrassingly parallel (rays are independent;
the sharded forward pass contains NO collectives — metrics psums
excepted), so N-chip efficiency is set by per-block overhead: each
device re-expands the tree and bins its own block. A single chip can
measure exactly that: render the same frame (a) whole and (b) as N
sequential bands through the banded pipeline — band k's work is
bit-for-bit a mesh-(N,1) device block's work. Then

    projected_efficiency(N) = t_whole / t_banded(N)

since N devices would each run one band in parallel (per-device time
t_banded/N) against the ideal t_whole/N.

NOTE (round 5): this banded method projects the PER-BLOCK sharded
path — now the fallback. Eligible binned frames route through the
shared-bin pipeline (`parallel/shared_bin.py`: one cooperative bin),
whose strong-scaling projection needs a stage decomposition instead:
see tools/sharedbin_probe.py (82.8% at N=2 vs this method's 48%,
docs/PERF.md round 5). The `config5` weak-scaling mode here remains
the right tool for banded-block large frames.

Usage: python tools/scaling_project.py [depth]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root for the package
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer

scene0 = default_scene()


def measure(cfg, fresh, n_big=22):
    @partial(jax.jit, static_argnames=("n",))
    def frames(scene, n):
        def body(acc, i):
            fi = i.astype(jnp.float32)
            cam = dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 1e-7 * fi
            )
            gb = render_gbuffer(dataclasses.replace(scene, camera=cam), cfg)
            return acc + gb.min_t[5, 5] + gb.min_t[77, 99], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    def run(n):
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        t0 = time.perf_counter()
        float(frames(dataclasses.replace(scene0, camera=cam), n))
        return time.perf_counter() - t0

    run(2)
    run(n_big)
    return min((run(n_big) - run(2)) / (n_big - 2) for _ in range(2))


def main(depth=6, mode="1080p"):
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind} depth={depth} "
          f"mode={mode}", file=sys.stderr)
    fresh = iter(range(1, 100000))
    if mode == "config5":
        # BASELINE config 5: 16384^2 sharded over N >= 2 hosts/chips.
        # Per-device block at N=8 is 16384x2048; weak-scaling
        # efficiency = t(whole 16k^2) / (8 * t(block)) since blocks
        # run concurrently on real chips.
        base = dict(width=16384, max_depth=depth, tile_h=32, tile_w=32,
                    algorithm="binned")
        t_whole = measure(RenderConfig(**base, height=16384), fresh, n_big=4)
        print(f"whole 16384x16384: {t_whole * 1e3:8.1f} ms "
              f"({16384 * 16384 / t_whole / 1e6:.0f}M rays/s)")
        for n in (2, 4, 8):
            tb = measure(
                RenderConfig(**base, height=16384 // n), fresh, n_big=4
            )
            eff = t_whole / (n * tb)
            print(
                f"N={n} chips (block 16384x{16384 // n}): per-block "
                f"{tb * 1e3:8.1f} ms -> projected weak-scaling "
                f"efficiency {eff * 100:6.1f}%",
                flush=True,
            )
        return
    base = dict(width=1920, height=1024, max_depth=depth, tile_h=32,
                tile_w=32, algorithm="binned")
    t_whole = measure(RenderConfig(**base), fresh)
    rays = 1920 * 1024
    print(f"whole-frame 1920x1024: {t_whole * 1e3:7.2f} ms "
          f"({rays / t_whole / 1e6:.1f}M rays/s)")
    for n in (2, 4, 8):
        tb = measure(
            RenderConfig(**base, band_tile_rows=32 // n), fresh
        )
        eff = t_whole / tb
        print(
            f"N={n} blocks (bands of {1024 // n} rows): sequential "
            f"{tb * 1e3:7.2f} ms -> projected {n}-chip efficiency "
            f"{eff * 100:6.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 6, a[1] if len(a) > 1 else "1080p")
