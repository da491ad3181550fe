"""Quick single-config perf probe on real TPU (latency-amortized).

Usage: python tools/perf_probe.py [algorithm] [depth] [cap]
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax.numpy as jnp
import numpy as np

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer


def probe(algorithm="pallas", depth=6, cap=1024, width=1920, height=1080,
          frames=8):
    cfg = RenderConfig(
        width=width, height=height, max_depth=depth, tile_h=32, tile_w=32,
        max_frontier=cap, algorithm=algorithm,
    )
    scene = default_scene()

    def frame(i):
        cam = dataclasses.replace(scene.camera, yaw=scene.camera.yaw + 1e-7 * i)
        return render_gbuffer(dataclasses.replace(scene, camera=cam), cfg)

    t0 = time.perf_counter()
    gb = frame(0)
    _ = float(np.asarray(jnp.sum(gb.min_t)))
    compile_s = time.perf_counter() - t0

    def loop(k):
        t0 = time.perf_counter()
        outs = [frame(1 + i).min_t[0, 0] for i in range(k)]
        _ = float(np.asarray(jnp.stack(outs).sum()))
        return time.perf_counter() - t0

    loop(2)
    t1 = loop(1)
    tk = loop(frames + 1)
    dt = (tk - t1) / frames
    rays = width * height
    print(
        f"{algorithm} depth={depth} cap={cap}: {rays / dt / 1e6:.1f}M rays/s "
        f"({dt * 1e3:.2f} ms/frame, compile {compile_s:.1f}s, "
        f"overflow={int(gb.metrics.overflow)}, "
        f"depth_reached={int(gb.metrics.max_depth_reached)}, "
        f"nodes={int(gb.metrics.nodes_visited)})"
    )
    return rays / dt


if __name__ == "__main__":
    args = sys.argv[1:]
    kw = {}
    if args:
        kw["algorithm"] = args[0]
    for name, val in zip(["depth", "cap"], args[1:]):
        kw[name] = int(val)
    probe(**kw)
