"""Per-stage timing of the binned production path on real TPU.

Times each pipeline stage in isolation (latency-amortized over K
dispatches) so optimization is evidence-driven (SURVEY §5 tracing row):
  expand+bin   XLA global tree walk + (node, tile) sort
  pairs-kernel Pallas per-tile ray loop
  resolve      path-code -> frame recompute + shading + untile
  full         the whole render_gbuffer

Usage: python tools/stage_probe.py [depth] [frames]
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
import numpy as np

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.render import render_gbuffer


def timeit(fn, frames=8):
    """Latency-cancelled steady-state seconds per call."""
    def loop(k):
        t0 = time.perf_counter()
        outs = [fn(1 + i) for i in range(k)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    loop(2)
    t1 = loop(1)
    tk = loop(frames + 1)
    return (tk - t1) / frames


def main(depth=6, frames=8):
    cfg = RenderConfig(
        width=1920, height=1080, max_depth=depth, tile_h=32, tile_w=32,
        max_frontier=1024, algorithm="binned",
    )
    scene = default_scene()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    def scene_i(i):
        cam = dataclasses.replace(scene.camera, yaw=scene.camera.yaw + 1e-7 * i)
        return dataclasses.replace(scene, camera=cam)

    from sphereflake_tpu.camera import corner_rays
    from sphereflake_tpu.ops.binned import (
        binned_pairs,
        trace_pairs_pallas_soa,
    )
    from sphereflake_tpu.ops.pallas_traversal import resolve_codes_soa
    from sphereflake_tpu.render import _tile

    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)

    bp = jax.jit(
        lambda s: binned_pairs(s, cfg, root_frame(s.camera.position),
                               child_templates(s.fractal)),
        static_argnames=(),
    )

    @jax.jit
    def dirs_of(s):
        T = cfg.tiles_y * cfg.tiles_x
        origin, tl, tr, bl = corner_rays(s.camera, cfg.width / cfg.height)
        ex, ey = tr - tl, bl - tl
        u = jnp.arange(cfg.padded_width, dtype=jnp.float32)[None, :] / cfg.width
        v = jnp.arange(cfg.padded_height, dtype=jnp.float32)[:, None] / cfg.height
        comps = [(tl[a] + (ex[a] * u + ey[a] * v)) - origin[a] for a in range(3)]
        dnorm = jnp.sqrt(comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2)
        tiled = [_tile(c / dnorm, cfg) for c in comps]
        return jnp.stack([t.reshape(T, 8, 128) for t in tiled], axis=1)

    pairs, starts, lens, _ = jax.block_until_ready(bp(scene_i(0)))
    dirs_k = jax.block_until_ready(dirs_of(scene_i(0)))

    t_bin = timeit(lambda i: bp(scene_i(i))[0], frames)
    print(f"expand+bin: {t_bin * 1e3:7.2f} ms")

    t_dirs = timeit(lambda i: dirs_of(scene_i(i)), frames)
    print(f"raygen:     {t_dirs * 1e3:7.2f} ms")

    kern = jax.jit(lambda d: trace_pairs_pallas_soa(
        d, pairs, starts, lens, cfg)[0])
    jax.block_until_ready(kern(dirs_k))
    t_kern = timeit(
        lambda i: kern(dirs_k * (1.0 + 1e-9 * i)), frames
    )
    print(f"pairs-kern: {t_kern * 1e3:7.2f} ms")

    out0 = jax.block_until_ready(kern(dirs_k))
    code = out0[:, 1].reshape(-1)

    res = jax.jit(lambda c, d: resolve_codes_soa(
        d[:, 0].reshape(-1), d[:, 1].reshape(-1), d[:, 2].reshape(-1),
        c, root, templates, scene.fractal, cfg))
    dflat = jnp.moveaxis(dirs_k, 1, 3).reshape(-1, 3)
    dflat = jnp.moveaxis(dirs_k, 1, 0).reshape(3, -1).T
    jax.block_until_ready(res(code, dflat))
    t_res = timeit(lambda i: res(code + 0 * i, dflat), frames)
    print(f"resolve:    {t_res * 1e3:7.2f} ms")

    t_full = timeit(
        lambda i: render_gbuffer(scene_i(i), cfg).min_t[0, 0], frames
    )
    rays = cfg.width * cfg.height
    print(f"full:       {t_full * 1e3:7.2f} ms  -> {rays / t_full / 1e6:.1f}M rays/s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
