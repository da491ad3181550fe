"""Perf sweep over algorithm / tile / frontier configs (dev tool).

Timing is latency-amortized (the axon tunnel adds ~27ms per synchronous
dispatch+fetch): K frames dispatch back-to-back with perturbed inputs,
one reduced scalar fetch at the end, and the 1-frame time subtracts out.

Usage: python tools/sweep.py [algorithm ...]   (default: pallas binned)
"""
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer

scene = default_scene()


def run(algorithm, cap, depth=6, w=1920, h=1080, frames=8):
    cfg = RenderConfig(
        width=w, height=h, max_depth=depth, tile_h=32, tile_w=32,
        max_frontier=cap, algorithm=algorithm,
    )

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
    print(
        f"{algorithm:8s} cap={cap:5d} depth={depth}: {dt * 1e3:8.2f} ms/frame "
        f"({w * h / dt / 1e6:7.1f}M rays/s, compile {compile_s:.0f}s, "
        f"overflow={int(gb.metrics.overflow)})",
        flush=True,
    )


if __name__ == "__main__":
    algs = sys.argv[1:] or ["pallas", "binned"]
    for alg in algs:
        run(alg, 1024)
