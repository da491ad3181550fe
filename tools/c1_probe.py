"""Fine-grained bisect of the bin stage's C1 (expansion + per-node
geometry + pair-fill/decode) — the round-5 close identified C1 ~ 2.0 ms
as the largest non-kernel stage of the 1080p full frame, but its
internal split (expansion? the gate-compaction sort? the fill scatter?
the running-max fills? the bit decode?) was never measured on its own.

Cumulative prefixes, scan + value-fetch marginal methodology
(docs/PERF.md): each prefix is jitted as a 22-frame lax.scan with
per-frame camera jitter; marginal = (t(22) - t(2)) / 20; stage cost =
difference of consecutive prefixes. Three interleaved trials; median.

Usage: python tools/c1_probe.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

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
    _IMIN,
    _running_max_rows,
    _sort_pairs,
    bin_geometry,
    corner_basis,
    expand_global,
)

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
fresh = iter(range(1, 100000))


def _nodes(scene):
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
    return nodes


def _geo(scene):
    nodes = _nodes(scene)
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
    return nodes, bin_geometry(nodes, minv, cfg, corners=corners)


def _fill_pieces(geo):
    """The _decode_tiles_window internals (two-row scheme), split."""
    pair_cap = cfg.pair_cap
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    n_nodes = geo["n_nodes"]
    first, counts = geo["first"], geo["counts"]
    tx0, ty0, bw = geo["tx0"], geo["ty0"], geo["bw"]
    iota_n = jnp.arange(n_nodes, dtype=jnp.int32)
    in_table = (counts > 0) & (first < pair_cap)
    slot_w = jnp.where(in_table, first, pair_cap + iota_n)
    nbits = max(1, (n_nodes - 1).bit_length())
    fbits_c = max(1, (pair_cap - 1).bit_length())
    txb = max(1, (tx_n - 1).bit_length())
    tyb = max(1, (ty_n - 1).bit_length())
    bwb = tx_n.bit_length()
    assert nbits + bwb <= 31 and fbits_c + txb + tyb <= 31
    sources = jnp.stack(
        [
            (iota_n << bwb) | bw,
            (first << (txb + tyb)) | (tx0 << tyb) | ty0,
        ]
    )
    marks = (
        jnp.full((2, pair_cap), -1, jnp.int32)
        .at[:, slot_w]
        .set(sources, mode="drop", unique_indices=True)
    )
    return marks, (nbits, fbits_c, txb, tyb, bwb)


def stage_fn(stage):
    def fn(scene):
        if stage == "expand":
            nodes = _nodes(scene)
            return (
                jnp.sum(nodes["cx"]) * 1e-9
                + jnp.sum(nodes["code"]).astype(jnp.float32) * 1e-9
                + jnp.sum(nodes["live"].astype(jnp.int32)).astype(
                    jnp.float32
                )
            )
        nodes, geo = _geo(scene)
        if stage == "geometry":
            return (
                jnp.sum(geo["counts"]).astype(jnp.float32)
                + jnp.sum(geo["tx0"] + geo["ty0"] + geo["bw"]).astype(
                    jnp.float32
                ) * 1e-9
                + geo["n_pairs"].astype(jnp.float32)
            )
        marks, bits = _fill_pieces(geo)
        if stage == "scatter":
            return jnp.sum(marks, dtype=jnp.int64).astype(jnp.float32)
        pk = _running_max_rows(marks)
        if stage == "fills":
            return sum(
                jnp.sum(r, dtype=jnp.int64).astype(jnp.float32)
                for r in pk
            )
        nbits, fbits_c, txb, tyb, bwb = bits
        pk_a, pk_b = pk
        pair_node = jnp.maximum(pk_a >> bwb, 0)
        nb_w = jnp.maximum(pk_a & ((1 << bwb) - 1), 1)
        p_first = pk_b >> (txb + tyb)
        p_tx0 = (pk_b >> tyb) & ((1 << txb) - 1)
        p_ty0 = pk_b & ((1 << tyb) - 1)
        iota_p = jnp.arange(cfg.pair_cap, dtype=jnp.int32)
        pair_rank = iota_p - p_first
        tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
        n_tiles = tx_n * ty_n
        p_tx = jnp.minimum(p_tx0 + pair_rank % nb_w, tx_n)
        p_ty = jnp.minimum(p_ty0 + pair_rank // nb_w, ty_n)
        tile = jnp.where(
            iota_p < geo["n_pairs"],
            jnp.minimum(p_ty * tx_n + p_tx, n_tiles),
            n_tiles,
        )
        if stage == "decode":
            return (
                jnp.sum(tile, dtype=jnp.int64)
                + jnp.sum(pair_node, dtype=jnp.int64)
            ).astype(jnp.float32)
        tile_s, node_s = _sort_pairs(tile, pair_node, geo["n_nodes"], n_tiles)
        bounds = jnp.searchsorted(
            tile_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        )
        return (
            jnp.sum(bounds, dtype=jnp.int64)
            + jnp.sum(node_s[::4097], dtype=jnp.int64)
        ).astype(jnp.float32)

    return fn


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


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    stages = ["expand", "geometry", "scatter", "fills", "decode", "sort"]
    fns = {}
    for s in stages:
        body = stage_fn(s)
        fns[s] = (make_scan(body, 2), make_scan(body, 22))
        t0 = time.perf_counter()
        run(fns[s][0])
        run(fns[s][1])
        print(f"compiled {s} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
    # Interleaved trials.
    trials = {s: [] for s in stages}
    for _ in range(3):
        for s in stages:
            f2, f22 = fns[s]
            trials[s].append((run(f22) - run(f2)) / 20)
    prev = 0.0
    for s in stages:
        med = sorted(trials[s])[1]
        print(
            f"{s:9s}: {med * 1e3:7.3f} ms cumulative   "
            f"(marginal {1e3 * (med - prev):+7.3f})   "
            f"trials {', '.join(f'{t * 1e3:.3f}' for t in sorted(trials[s]))}",
            flush=True,
        )
        prev = med


if __name__ == "__main__":
    main()
