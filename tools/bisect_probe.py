"""Bisect the binned render_gbuffer pipeline into cumulative jit stages
to locate where the frame time actually goes on real TPU.

Usage: python tools/bisect_probe.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

os.makedirs("/root/.cache/jax-bench", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from sphereflake_tpu.camera import corner_rays
from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import binned_pairs, trace_pairs_pallas_soa
from sphereflake_tpu.ops.intersect import safe_sqrt
from sphereflake_tpu.ops.pallas_traversal import resolve_codes_soa
from sphereflake_tpu.render import _tile, _untile, render_gbuffer

cfg = RenderConfig(
    width=1920, height=1080, max_depth=6, tile_h=32, tile_w=32,
    max_frontier=1024, algorithm="binned",
)
scene0 = default_scene()
T = cfg.tiles_y * cfg.tiles_x
rays = cfg.tile_h * cfg.tile_w


def scene_i(i):
    cam = dataclasses.replace(
        scene0.camera, yaw=scene0.camera.yaw + 1e-7 * i
    )
    return dataclasses.replace(scene0, camera=cam)


def upto(stage):
    def fn(scene):
        origin, tl, tr, bl = corner_rays(scene.camera, cfg.width / cfg.height)
        ex, ey = tr - tl, bl - tl
        u = jnp.arange(cfg.padded_width, dtype=jnp.float32)[None, :] / cfg.width
        v = jnp.arange(cfg.padded_height, dtype=jnp.float32)[:, None] / cfg.height
        comps = [(tl[a] + (ex[a] * u + ey[a] * v)) - origin[a] for a in range(3)]
        dnorm = jnp.sqrt(comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2)
        tiled = [_tile(c / dnorm, cfg) for c in comps]
        dirs_k = jnp.stack([t.reshape(T, 8, 128) for t in tiled], axis=1)
        if stage == "dirs":
            return dirs_k
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        pairs, starts, lens, (_np_, povf) = binned_pairs(
            scene, cfg, root, templates
        )
        if stage == "bin":
            return pairs[0, 0] + dirs_k[0, 0, 0, 0]
        out, m = trace_pairs_pallas_soa(dirs_k, pairs, starts, lens, cfg)
        if stage == "kern":
            return out[:, 0]
        code = out[:, 1].reshape(-1)
        dx, dy, dz = (t.reshape(-1) for t in tiled)
        min_t, cx, cy, cz, hit = resolve_codes_soa(
            dx, dy, dz, code, root, templates, scene.fractal, cfg
        )
        if stage == "resolve":
            return min_t
        t0 = jnp.where(hit, min_t, 0.0)
        px, py, pz = dx * t0, dy * t0, dz * t0
        wx, wy, wz = px - cx, py - cy, pz - cz
        nn = safe_sqrt(wx * wx + wy * wy + wz * wz)
        nn = jnp.where(nn > 0, nn, 1.0)
        outs = [
            jnp.where(hit, w / nn, 0.0) for w in (wx, wy, wz)
        ] + [jnp.where(hit, p, 0.0) for p in (px, py, pz)]
        imgs = [_untile(o.reshape(T, rays), cfg) for o in outs]
        if stage == "shade":
            return imgs[0][0, 0]
        return jnp.stack(imgs[:3], axis=-1)[0, 0, 0]

    return jax.jit(fn)


def timeit(fn, frames=8):
    def loop(k):
        t0 = time.perf_counter()
        outs = [fn(scene_i(1 + i)) for i in range(k)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    loop(2)
    t1 = loop(1)
    tk = loop(frames + 1)
    return (tk - t1) / frames


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    for stage in ["dirs", "bin", "kern", "resolve", "shade", "stack"]:
        fn = upto(stage)
        jax.block_until_ready(fn(scene_i(0)))
        dt = timeit(fn)
        print(f"upto {stage:8s}: {dt * 1e3:7.2f} ms", flush=True)
    dt = timeit(lambda s: render_gbuffer(s, cfg).min_t[0, 0])
    print(f"render_gbuffer: {dt * 1e3:7.2f} ms -> "
          f"{cfg.width * cfg.height / dt / 1e6:.1f}M rays/s")


if __name__ == "__main__":
    main()
