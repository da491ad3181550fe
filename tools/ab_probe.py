"""Quick A/B timing of a single pipeline piece on the real TPU
(scan+value-fetch methodology). Edit/flag the code, rerun, compare.

Usage: python tools/ab_probe.py [bin|untile|kern|full] [depth]
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
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import (
    binned_pairs,
    camera_vector,
    trace_pairs_fused_soa,
)
from sphereflake_tpu.render import _untile_rows, render_gbuffer

scene0 = default_scene()


def body_fn(which, cfg):
    def fn(scene):
        if which == "full":
            return render_gbuffer(scene, cfg).min_t[5, 5]
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        pairs, starts, lens, (n_pairs, povf) = binned_pairs(
            scene, cfg, root, templates
        )
        if which == "bin":
            return jnp.sum(lens).astype(jnp.float32) + pairs[0, 0]
        cam = camera_vector(scene, cfg)
        out, m = trace_pairs_fused_soa(cam, pairs, starts, lens, cfg)
        if which == "kern":
            return jnp.sum(out[:, 0, 0, 0])
        rows = jnp.concatenate([out[:, :1], out[:, -6:]], axis=1)
        imgs = _untile_rows(rows, cfg)
        return sum(jnp.sum(im[:, 0]) for im in imgs)

    return fn


def main(which="bin", depth=6):
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=depth, tile_h=32, tile_w=32,
        max_frontier=1024, algorithm="binned",
    )
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind} probe={which}",
          file=sys.stderr)
    fresh = iter(range(1, 100000))
    body = body_fn(which, cfg)

    def make_scan(n):
        @jax.jit
        def frames(scene):
            def sbody(acc, i):
                fi = i.astype(jnp.float32)
                cam = dataclasses.replace(
                    scene.camera,
                    yaw=scene.camera.yaw + 1e-7 * fi,
                    position=scene.camera.position + 1e-7 * fi,
                )
                r = body(dataclasses.replace(scene, camera=cam))
                return acc + r * 1e-30, None

            acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(n))
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

    f2, f22 = make_scan(2), make_scan(22)
    tc0 = time.perf_counter()
    run(f2)
    run(f22)
    tc = time.perf_counter() - tc0
    best = min((run(f22) - run(f2)) / 20 for _ in range(3))
    print(f"{which}: {best * 1e3:7.2f} ms/frame (compile {tc:.0f}s)",
          flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "bin", int(a[1]) if len(a) > 1 else 6)
