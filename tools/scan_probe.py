"""Device-bound frame timing: render N frames inside ONE dispatch via
lax.scan, so tunneled-launch RPC overhead cannot pollute the number.
Marginal per-frame time = (t_big - t_small) / (n_big - n_small).

Usage: python tools/scan_probe.py [depth] [algorithm]
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
from sphereflake_tpu.render import render_gbuffer


def main(depth=6, algorithm="binned"):
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=depth, tile_h=32, tile_w=32,
        max_frontier=1024, algorithm=algorithm,
    )
    scene0 = default_scene()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}  algorithm={algorithm} "
          f"depth={depth}", file=sys.stderr)

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def frames(scene, n):
        def body(acc, i):
            cam = dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 1e-7 * i.astype(jnp.float32)
            )
            gb = render_gbuffer(dataclasses.replace(scene, camera=cam), cfg)
            return acc + gb.min_t[0, 0] + gb.min_t[123, 456], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    fresh = iter(range(1, 10000))

    def run(n):
        # Fresh scene every call: the axon relay memoizes identical
        # (executable, inputs) dispatches, so repeats return cached
        # results in ~0.1 ms and time nothing.
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        sc = dataclasses.replace(scene0, camera=cam)
        t0 = time.perf_counter()
        # Fetch the VALUE: on the experimental axon backend,
        # block_until_ready can return before execution completes; a
        # device->host value fetch cannot.
        val = float(frames(sc, n))
        dt = time.perf_counter() - t0
        print(f"  (n={n} acc={val:.6f})", file=sys.stderr)
        return dt

    t0 = time.perf_counter()
    run(2)
    run(22)
    print(f"compile (n=2 and n=22 variants): {time.perf_counter() - t0:.1f}s")

    for trial in range(3):
        t2 = run(2)
        t22 = run(22)
        dt = (t22 - t2) / 20
        rays = cfg.width * cfg.height
        print(
            f"trial {trial}: n=2 {t2 * 1e3:8.1f} ms, n=22 {t22 * 1e3:8.1f} ms"
            f" -> {dt * 1e3:7.2f} ms/frame = {rays / dt / 1e6:8.1f}M rays/s",
            flush=True,
        )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 6, a[1] if len(a) > 1 else "binned")
