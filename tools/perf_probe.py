"""Quick perf probe for the Pallas traversal on real TPU.

Usage: python tools/perf_probe.py [tile_h] [tile_w] [max_frontier] [depth]
Prints rays/s and overflow for the 1080p scene at the given tiling.
"""
from __future__ import annotations

import sys
import time

import jax

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer


def probe(tile_h=8, tile_w=128, cap=512, depth=6, width=1920, height=1080,
          algorithm="pallas", frames=5):
    cfg = RenderConfig(
        width=width, height=height, max_depth=depth,
        tile_h=tile_h, tile_w=tile_w, max_frontier=cap,
        algorithm=algorithm,
    )
    scene = default_scene()
    t0 = time.perf_counter()
    gb = render_gbuffer(scene, cfg)
    jax.block_until_ready(gb.min_t)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(frames):
        gb = render_gbuffer(scene, cfg)
    jax.block_until_ready(gb.min_t)
    dt = time.perf_counter() - t0
    rays = width * height * frames
    print(
        f"tile={tile_h}x{tile_w} cap={cap} depth={depth} alg={algorithm}: "
        f"{rays / dt / 1e6:.1f}M rays/s  ({dt / frames * 1e3:.2f} ms/frame, "
        f"compile {compile_s:.1f}s, overflow={int(gb.metrics.overflow)}, "
        f"depth_reached={int(gb.metrics.max_depth_reached)}, "
        f"nodes={int(gb.metrics.nodes_visited)})"
    )
    return rays / dt


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    kw = {}
    for name, val in zip(["tile_h", "tile_w", "cap", "depth"], args):
        kw[name] = val
    probe(**kw)
