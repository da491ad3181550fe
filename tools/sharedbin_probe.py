"""Projected strong-scaling efficiency of the SHARED-BIN sharded path
(`parallel/shared_bin.py`), measured on ONE real chip.

One device's per-frame work under shared-bin is:

    t_dev(D) = fill_window(cap/D) + [sort + searchsorted] (replicated)
             + gather_window(cap/D) + kernel(T/D tiles) + untile(1/D)
             + all-gather (~5 MB over ICI, estimated below)

Each term is measured by CUMULATIVE jits (scan + value-fetch marginal,
docs/PERF.md methodology), subtracting prefixes:

    C1(D) = expand + geometry + decode window cap/D + pack
    C2    = C1(full) + sort + searchsorted
    C3(D) = C2 + fat-rows gather window cap/D
    C4(D) = C2 + full gather + kernel on T/D tiles + untile block

    t_dev(D) = C1(D) + [C2 - C1(full)] + [C3(D) - C2] + [C4(D) - C3(full)]
    eff(D)   = F / (D * t_dev(D)),  F = full single-device frame

Usage: python tools/sharedbin_probe.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

from sphereflake_tpu.camera import corner_rays, tile_frustum_planes
from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import (
    _decode_tiles_window,
    _sort_pairs,
    bin_geometry,
    camera_vector,
    corner_basis,
    expand_global,
    node_rows,
    trace_pairs_fused_subset,
)
from sphereflake_tpu.render import _untile_rows, render_gbuffer

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
T = cfg.tiles_y * cfg.tiles_x
CAP = cfg.pair_cap
fresh = iter(range(1, 100000))
# all-gather estimate: pairs window gathers ~8 rows * cap * 4 B ~= 4.7
# MB + 0.6 MB keys over ICI (v5e ~45 GB/s/link within a pod slice).
AG_MS = 0.15


def _prep(scene):
    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)
    frame_planes = tile_frustum_planes(
        scene.camera, cfg.width, cfg.height,
        cfg.padded_height, cfg.padded_width,
        block_h=cfg.padded_height, block_w=cfg.padded_width,
    )[0]
    nodes, _ovf = expand_global(
        root, templates, scene.fractal, cfg, frame_planes
    )
    minv = corner_basis(scene.camera, cfg.width, cfg.height)
    origin, tl, tr, bl = corner_rays(scene.camera, cfg.width / cfg.height)
    ex, ey = tr - tl, bl - tl
    u1 = jnp.float32(cfg.padded_width / cfg.width)
    v1 = jnp.float32(cfg.padded_height / cfg.height)
    base = tl - origin
    corners = jnp.stack(
        [base + u * ex + v * ey
         for u in (jnp.float32(0.0), u1) for v in (jnp.float32(0.0), v1)]
    )
    geo = bin_geometry(nodes, minv, cfg, corners=corners)
    return nodes, geo


def stage_fn(stage, D):
    capD = CAP // D

    def one(scene):
        nodes, geo = _prep(scene)
        tile_w_, node_w = _decode_tiles_window(geo, cfg, 0, capD)
        if stage == "c1":
            return jnp.sum(tile_w_) + jnp.sum(node_w)
        tile, pair_node = (
            (tile_w_, node_w) if D == 1
            else _decode_tiles_window(geo, cfg, 0, CAP)
        )
        ts, ns = _sort_pairs(tile, pair_node, geo["n_nodes"], T)
        bounds = jnp.searchsorted(ts, jnp.arange(T + 1, dtype=jnp.int32))
        starts = bounds[:-1].astype(jnp.int32)
        lens = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
        if stage == "c2":
            return jnp.sum(starts) + jnp.sum(lens)
        rows = node_rows(nodes, cfg)
        if stage == "c3":
            # Full-sum consumption: sliced consumption lets XLA narrow
            # the gather itself (round-4 lesson: pairs[0, ::64] DCE'd
            # 7 of 8 gather rows).
            pw = rows[:, ns[:capD]]
            return jnp.sum(pw)
        pairs = rows[:, ns]
        dead = ts >= T
        pairs = pairs.at[3, :].set(
            jnp.where(dead, -jnp.float32(3.0e38), pairs[3, :])
        )
        cam = camera_vector(scene, cfg)
        gids = jnp.arange(T // D, dtype=jnp.int32)
        out, _m = trace_pairs_fused_subset(
            cam, pairs, starts, lens, gids, cfg
        )
        bcfg = dataclasses.replace(
            cfg, height=(T // D) // cfg.tiles_x * cfg.tile_h
            if (T // D) % cfg.tiles_x == 0 else cfg.tile_h,
            width=cfg.padded_width
            if (T // D) % cfg.tiles_x == 0 else (T // D) * cfg.tile_w,
        )
        imgs = _untile_rows(out, bcfg)
        return jnp.sum(imgs[0])

    @partial(jax.jit, static_argnames=("n",))
    def scan(scene, n):
        def body(acc, i):
            cam = dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 1e-7 * i.astype(jnp.float32)
            )
            return acc + one(dataclasses.replace(scene, camera=cam)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    return scan


def measure(scan, label):
    def run(n):
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        t0 = time.perf_counter()
        float(scan(dataclasses.replace(scene0, camera=cam), n))
        return time.perf_counter() - t0

    run(2)
    run(22)
    trials = sorted((run(22) - run(2)) / 20 for _ in range(3))
    print(f"{label:16s}: {trials[1] * 1e3:7.3f} ms "
          f"(trials {', '.join(f'{t * 1e3:.3f}' for t in trials)})",
          flush=True)
    return trials[1]


def full_frame():
    @partial(jax.jit, static_argnames=("n",))
    def scan(scene, n):
        def body(acc, i):
            cam = dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 1e-7 * i.astype(jnp.float32)
            )
            gb = render_gbuffer(dataclasses.replace(scene, camera=cam), cfg)
            return acc + gb.min_t[5, 5] + gb.min_t[540, 960], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    return scan


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    F = measure(full_frame(), "F full frame")
    c1_full = measure(stage_fn("c1", 1), "C1 fill(full)")
    c2 = measure(stage_fn("c2", 1), "C2 +sort+ss")
    c3_full = measure(stage_fn("c3", 1), "C3 +gather(full)")
    c4_full = measure(stage_fn("c4", 1), "C4 +kern(full)")
    sort_tail = max(c2 - c1_full, 0.0)
    print(f"\nreplicated tail (sort+ss): {sort_tail * 1e3:.3f} ms")
    for D in (2, 4, 8):
        c1 = measure(stage_fn("c1", D), f"C1 fill(1/{D})")
        c3 = measure(stage_fn("c3", D), f"C3 +gather(1/{D})")
        c4 = measure(stage_fn("c4", D), f"C4 +kern(1/{D})")
        t_dev = (
            c1 + sort_tail + max(c3 - c2, 0.0)
            + max(c4 - c3_full, 0.0) + AG_MS * 1e-3
        )
        eff = F / (D * t_dev)
        print(
            f"D={D}: per-device {t_dev * 1e3:6.2f} ms -> projected "
            f"strong-scaling efficiency {eff * 100:5.1f}% "
            f"(incl. {AG_MS} ms all-gather estimate)",
            flush=True,
        )


if __name__ == "__main__":
    main()
