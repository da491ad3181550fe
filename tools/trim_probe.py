"""Occlusion-trim probe: how many (node, tile) pairs can the
static-view frameless mode provably skip, and what does that do to the
sustained refresh step?

Measures, interleaved in one process (tunnel drift — docs/PERF.md):
  - trimmed-vs-plain pair count at the reference pose (1080p depth-6);
  - sustained 2048-tile refresh step, plain vs trimmed pair table;
  - bit-parity of the accumulated buffer vs the full render (the trim
    is only admissible because this holds).

Usage: python tools/trim_probe.py
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
import numpy as np

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.runtime.progressive import (
    progressive_prepare,
    progressive_prepare_trimmed,
    progressive_tiles_init,
    progressive_tiles_step,
    tile_progressive_gbuffer,
)

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


def make_refresh(n, trim):
    @jax.jit
    def run(scene):
        prepared = (
            progressive_prepare_trimmed(scene, cfg)
            if trim
            else progressive_prepare(scene, cfg)
        )
        state = progressive_tiles_init(cfg, seed=0)

        def body(st, _):
            st = progressive_tiles_step(
                st, scene, cfg, tiles_per_step=TILES_PER_STEP,
                prepared=prepared,
            )
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state.rows[5, 0, 0, 0] + state.closest_distance

    return run


def timed(fn, sc):
    t0 = time.perf_counter()
    float(fn(sc))
    return time.perf_counter() - t0


def marginal(trim, label):
    f2, f22 = make_refresh(2, trim), make_refresh(22, trim)
    tc0 = time.perf_counter()
    timed(f2, fresh_scene())
    timed(f22, fresh_scene())
    tc = time.perf_counter() - tc0
    trials = sorted(
        (timed(f22, fresh_scene()) - timed(f2, fresh_scene())) / 20
        for _ in range(3)
    )
    med = trials[1]
    print(
        f"{label:14s}: {med * 1e3:7.2f} ms/step median "
        f"(trials {', '.join(f'{t * 1e3:.2f}' for t in trials)}; "
        f"compile {tc:.0f}s)",
        flush=True,
    )
    return med


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    # Pair-count + parity check.
    plain = progressive_prepare(scene0, cfg)
    trimmed = progressive_prepare_trimmed(scene0, cfg)
    n_plain = int(np.asarray(plain[2]).sum())
    n_trim = int(np.asarray(trimmed[2]).sum())
    print(
        f"pairs: plain {n_plain} -> trimmed {n_trim} "
        f"({1 - n_trim / n_plain:.1%} dropped)"
    )

    st_a = progressive_tiles_init(cfg, seed=3)
    st_b = progressive_tiles_init(cfg, seed=3)
    for _ in range(2):
        st_a = progressive_tiles_step(
            st_a, scene0, cfg, tiles_per_step=T, prepared=plain
        )
        st_b = progressive_tiles_step(
            st_b, scene0, cfg, tiles_per_step=T, prepared=trimmed
        )
    _pa, _na, mt_a, _ = tile_progressive_gbuffer(st_a, cfg)
    _pb, _nb, mt_b, _ = tile_progressive_gbuffer(st_b, cfg)
    mt_a, mt_b = np.asarray(mt_a), np.asarray(mt_b)
    bit = (mt_a == mt_b).mean()
    print(f"trimmed-vs-plain buffer bit-parity: {bit:.6f}")
    if bit < 1.0:
        bad = np.argwhere(mt_a != mt_b)[:5]
        for y, x in bad:
            print(f"  mismatch at ({y},{x}): {mt_a[y, x]} vs {mt_b[y, x]}")

    # Interleaved step timing.
    t_plain = marginal(False, "refresh/plain")
    t_trim = marginal(True, "refresh/trim")
    t_plain2 = marginal(False, "refresh/plain")
    tp = min(t_plain, t_plain2)
    rays = TILES_PER_STEP * 1024
    print(
        f"\nsustained: plain {rays / tp / 1e6:.0f}M -> trimmed "
        f"{rays / t_trim / 1e6:.0f}M rays/s ({tp / t_trim:.2f}x)"
    )


if __name__ == "__main__":
    main()
