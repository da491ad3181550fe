"""Trustworthy per-stage timing of the binned path: each cumulative
pipeline prefix is wrapped in a lax.scan over frames inside ONE
dispatch, and timed by fetching the scalar result value (the only sync
that works on the axon backend). Marginal stage cost = difference of
consecutive rows; launch+fetch overhead cancels via (n=22) - (n=2).

Usage: python tools/scan_bisect.py [depth]
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
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import (
    binned_pairs,
    camera_vector,
    trace_pairs_fused_soa,
)
from sphereflake_tpu.render import _untile_rows, render_gbuffer

scene0 = default_scene()


def stage_fn(stage, cfg):
    T = cfg.tiles_y * cfg.tiles_x

    def fn(scene):
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        if stage == "expand":
            from sphereflake_tpu.camera import tile_frustum_planes
            from sphereflake_tpu.ops.binned import expand_global

            frame_planes = tile_frustum_planes(
                scene.camera, cfg.width, cfg.height,
                cfg.padded_height, cfg.padded_width,
                block_h=cfg.padded_height, block_w=cfg.padded_width,
            )[0]
            nodes, _ = expand_global(
                root, templates, scene.fractal, cfg, frame_planes
            )
            return jnp.sum(nodes["live"].astype(jnp.int32)).astype(
                jnp.float32
            )
        pairs, starts, lens, (n_pairs, povf) = binned_pairs(
            scene, cfg, root, templates
        )
        if stage == "bin":
            return jnp.sum(lens).astype(jnp.float32) + pairs[0, 0]
        cam = camera_vector(scene, cfg)
        out, m = trace_pairs_fused_soa(cam, pairs, starts, lens, cfg)
        if stage == "kern":
            return jnp.sum(out[:, 0, 0, 0])
        rows = jnp.concatenate([out[:, :1], out[:, -6:]], axis=1)
        imgs = _untile_rows(rows, cfg)
        return sum(jnp.sum(im[:, 0]) for im in imgs)

    return fn

def main(depth=6):
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=depth, tile_h=32, tile_w=32,
        max_frontier=1024, algorithm="binned",
    )
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind} depth={depth}",
          file=sys.stderr)
    fresh = iter(range(1, 100000))

    def make_scan(body_fn, n):
        @jax.jit
        def frames(scene):
            def body(acc, i):
                fi = i.astype(jnp.float32)
                cam = dataclasses.replace(
                    scene.camera,
                    yaw=scene.camera.yaw + 1e-7 * fi,
                    position=scene.camera.position + 1e-7 * fi,
                )
                r = body_fn(dataclasses.replace(scene, camera=cam))
                return acc + r * 1e-30, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return acc

        return frames

    def run(frames_fn):
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        sc = dataclasses.replace(scene0, camera=cam)
        t0 = time.perf_counter()
        float(frames_fn(sc))
        return time.perf_counter() - t0

    results = {}
    for stage in ["expand", "bin", "kern", "untile", "full"]:
        if stage == "full":
            body = lambda s: render_gbuffer(s, cfg).min_t[5, 5]
        else:
            body = stage_fn(stage, cfg)
        f2, f22 = make_scan(body, 2), make_scan(body, 22)
        tc0 = time.perf_counter()
        run(f2)
        run(f22)
        tc = time.perf_counter() - tc0
        best = min((run(f22) - run(f2)) / 20 for _ in range(2))
        results[stage] = best
        print(f"{stage:8s}: {best * 1e3:7.2f} ms/frame   "
              f"(compile {tc:.0f}s)", flush=True)
    rays = cfg.width * cfg.height
    print(f"full -> {rays / results['full'] / 1e6:.1f}M rays/s")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 6)
