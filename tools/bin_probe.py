"""Sub-stage timing of bin_nodes on real TPU (scan+value-fetch method):
which of expand / pair-decode / sort / gather dominates the 34 ms.

Usage: python tools/bin_probe.py [depth]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp

from sphereflake_tpu.camera import tile_frustum_planes
from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import corner_basis, expand_global

scene0 = default_scene()


def stage_fn(stage, cfg):
    def fn(scene):
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        frame_planes = tile_frustum_planes(
            scene.camera, cfg.width, cfg.height,
            cfg.padded_height, cfg.padded_width,
            block_h=cfg.padded_height, block_w=cfg.padded_width,
        )[0]
        nodes, _exp_ovf = expand_global(root, templates, scene.fractal, cfg, frame_planes)
        if stage == "expand":
            return jnp.sum(nodes["cx"] * 1e-3)
        minv = corner_basis(scene.camera, cfg.width, cfg.height)

        # --- inline bin_nodes with cut points ---
        tw, th = cfg.tile_w, cfg.tile_h
        tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
        n_tiles = tx_n * ty_n
        sx, sy = cfg.width / tw, cfg.height / th
        c = [nodes["cx"], nodes["cy"], nodes["cz"]]
        rad = nodes["rad"]
        s = [minv[k, 0] * c[0] + minv[k, 1] * c[1] + minv[k, 2] * c[2]
             for k in range(3)]
        mnorm = [jnp.sqrt(jnp.sum(minv[k] * minv[k])) for k in range(3)]
        ds = [mnorm[k] * rad for k in range(3)]
        s2_lo, s2_hi = s[2] - ds[2], s[2] + ds[2]
        front = s2_lo > 0.0

        def ratio_bounds(num, dnum):
            n_lo, n_hi = num - dnum, num + dnum
            cands = [n_lo / s2_lo, n_lo / s2_hi, n_hi / s2_lo, n_hi / s2_hi]
            return (
                jnp.minimum(jnp.minimum(cands[0], cands[1]),
                            jnp.minimum(cands[2], cands[3])),
                jnp.maximum(jnp.maximum(cands[0], cands[1]),
                            jnp.maximum(cands[2], cands[3])),
            )

        u_lo, u_hi = ratio_bounds(s[0], ds[0])
        v_lo, v_hi = ratio_bounds(s[1], ds[1])
        tx0 = jnp.clip(jnp.floor(u_lo * sx).astype(jnp.int32), 0, tx_n - 1)
        tx1 = jnp.clip(jnp.floor(u_hi * sx).astype(jnp.int32), 0, tx_n - 1)
        ty0 = jnp.clip(jnp.floor(v_lo * sy).astype(jnp.int32), 0, ty_n - 1)
        ty1 = jnp.clip(jnp.floor(v_hi * sy).astype(jnp.int32), 0, ty_n - 1)
        tx0 = jnp.where(front, tx0, 0)
        ty0 = jnp.where(front, ty0, 0)
        tx1 = jnp.where(front, tx1, tx_n - 1)
        ty1 = jnp.where(front, ty1, ty_n - 1)
        bw = tx1 - tx0 + 1
        counts = jnp.where(nodes["live"], bw * (ty1 - ty0 + 1), 0)
        offsets = jnp.cumsum(counts)
        if stage == "counts":
            return jnp.sum(offsets[-1].astype(jnp.float32)) * 1e-6

        PAIR_CAP = cfg.pair_cap
        first = offsets - counts
        if stage == "counts":
            return jnp.sum(offsets[-1].astype(jnp.float32)) * 1e-6
        from sphereflake_tpu.ops.binned import _running_max_rows
        slot = jnp.where((counts > 0) & (first < PAIR_CAP), first, PAIR_CAP)
        iota_p = jnp.arange(PAIR_CAP, dtype=jnp.int32)
        fbits = 18
        abits = 31 - fbits
        amask = (1 << abits) - 1
        sources = jnp.stack([
            jnp.arange(counts.shape[0], dtype=jnp.int32),
            (first << abits) | tx0,
            (first << abits) | ty0,
            (first << abits) | bw,
        ])
        marks = (
            jnp.full((4, PAIR_CAP), -1, jnp.int32)
            .at[:, slot]
            .set(sources, mode="drop", unique_indices=True)
        )
        if stage == "scatter":
            return jnp.sum(marks[:, ::64].astype(jnp.float32)) * 1e-9
        pair_node, pk_x0, pk_y0, pk_bw = _running_max_rows(marks)
        if stage == "fills":
            return jnp.sum((pair_node + pk_x0 + pk_y0 + pk_bw
                            ).astype(jnp.float32)) * 1e-9
        p_first = pk_x0 >> abits
        pair_rank = iota_p - p_first
        pair_valid = iota_p < offsets[-1]
        nb_w = jnp.maximum(pk_bw & amask, 1)
        p_tx = (pk_x0 & amask) + pair_rank % nb_w
        p_ty = (pk_y0 & amask) + pair_rank // nb_w
        tile = jnp.where(pair_valid, p_ty * tx_n + p_tx, n_tiles)
        if stage == "decode":
            return jnp.sum(tile.astype(jnp.float32)) * 1e-9
        tile_sorted, node_sorted = jax.lax.sort((tile, pair_node), num_keys=1)
        if stage == "sort":
            return jnp.sum((tile_sorted[::64] + node_sorted[::64]
                            ).astype(jnp.float32)) * 1e-9
        rows = jnp.stack([
            nodes["cx"], nodes["cy"], nodes["cz"],
            nodes["r2"] - nodes["cc"], 4.0 * nodes["r2"] - nodes["cc"],
            nodes["lodr"], nodes["code"].astype(jnp.float32),
            nodes["code_hi"].astype(jnp.float32),
        ])
        pairs = rows[:, node_sorted]
        if stage == "gather":
            return jnp.sum(pairs[0, ::64]) * 1e-6
        bounds = jnp.searchsorted(
            tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32))
        return (jnp.sum(pairs[0, ::64]) * 1e-6
                + jnp.sum((bounds[1:] - bounds[:-1]).astype(jnp.float32))
                * 1e-9)

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

    for stage in ["counts", "scatter", "fills", "decode", "sort", "gather", "searchsorted"]:
        body = stage_fn(stage, cfg)
        f2, f22 = make_scan(body, 2), make_scan(body, 22)
        tc0 = time.perf_counter()
        run(f2)
        run(f22)
        tc = time.perf_counter() - tc0
        best = min((run(f22) - run(f2)) / 20 for _ in range(2))
        print(f"{stage:8s}: {best * 1e3:7.2f} ms/frame   (compile {tc:.0f}s)",
              flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 6)
