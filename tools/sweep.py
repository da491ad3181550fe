"""Perf sweep: tile shape x frontier cap at 1080p depth-6 (dev tool)."""
import sys
import time

import jax

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer

scene = default_scene()


def perturbed(i):
    import dataclasses
    cam = dataclasses.replace(scene.camera, yaw=scene.camera.yaw + 1e-6 * i)
    return dataclasses.replace(scene, camera=cam)


def run(tile_h, tile_w, cap, batch, depth=6, w=1920, h=1080, frames=3):
    cfg = RenderConfig(
        width=w, height=h, max_depth=depth, tile_h=tile_h, tile_w=tile_w,
        max_frontier=cap, tile_batch=batch,
    )
    t0 = time.perf_counter()
    gb = render_gbuffer(scene, cfg)
    jax.block_until_ready(gb.min_t)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(frames):
        gb = render_gbuffer(perturbed(i + 1), cfg)
        jax.block_until_ready(gb.min_t)
    dt = (time.perf_counter() - t0) / frames
    rays = w * h / dt
    m = gb.metrics
    print(
        f"tile {tile_h:4d}x{tile_w:4d} cap {cap:5d} batch {batch:3d}: "
        f"{dt*1e3:8.1f} ms/frame {rays/1e6:8.1f} M rays/s "
        f"depth={int(m.max_depth_reached)} overflow={int(m.overflow)} "
        f"nodes={int(m.nodes_visited)} (compile {compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    for args in [
        # (tile_h, tile_w, cap, batch)
        (120, 128, 1024, 27),   # current bench config
        (40, 64, 1024, 27),
        (40, 64, 512, 54),
        (24, 32, 512, 100),
        (24, 32, 256, 100),
        (8, 128, 512, 54),
    ]:
        run(*args)
