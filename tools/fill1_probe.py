"""Interleaved A/B/C of the pair-fill scheme at 1080p depth-6 on the
real chip:

  A. shipped TWO-ROW packed scatter fill ([2, width] marks)
  B. SINGLE-ROW node-id scatter + shared-index attribute gather
  C. two-row fill with TRANSPOSED scatter layout ([width, 2] marks —
     one contiguous 8-byte slice per index instead of two strided
     4-byte elements)

Round-5 result (docs/PERF.md): tools/c1_probe.py measured the fill
scatter alone at ~1.8 ms/frame. Variant B tested whether that cost was
per scattered ELEMENT (it is not — B measured 0.88x, the scatter is
per-INDEX bound at ~13 ns/index and extra rows ride nearly free, while
the replacement gather added real time). Variant C tests whether the
per-index cost is the strided row writes.

All variants run the IDENTICAL downstream composition (sort, fat-row
gather, fused kernel, untile); a bit-parity gate compares their min_t
planes first. Scan + value-fetch marginal methodology (docs/PERF.md).

Usage: python tools/fill1_probe.py
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
import numpy as np

from sphereflake_tpu.camera import corner_rays, tile_frustum_planes
from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.binned import (
    _BIG,
    _IMIN,
    _decode_tiles_window,
    _running_max_rows,
    _sort_pairs,
    bin_geometry,
    camera_vector,
    corner_basis,
    expand_global,
    node_rows,
    trace_pairs_fused_soa,
)
from sphereflake_tpu.render import _untile_rows

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
fresh = iter(range(1, 100000))


def _layout(geo, cfg, lo, width):
    pair_cap = cfg.pair_cap
    n_nodes = geo["n_nodes"]
    first, counts = geo["first"], geo["counts"]
    iota_n = jnp.arange(n_nodes, dtype=jnp.int32)
    in_table = (counts > 0) & (first < pair_cap)
    in_win = in_table & (first >= lo) & (first < lo + width)
    slot_w = jnp.where(in_win, first - lo, width + iota_n)
    return iota_n, in_table, slot_w


def _two_row_sources(geo, cfg, iota_n):
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    first = geo["first"]
    tx0, ty0, bw = geo["tx0"], geo["ty0"], geo["bw"]
    txb = max(1, (tx_n - 1).bit_length())
    tyb = max(1, (ty_n - 1).bit_length())
    bwb = tx_n.bit_length()
    sources = jnp.stack(
        [
            (iota_n << bwb) | bw,
            (first << (txb + tyb)) | (tx0 << tyb) | ty0,
        ]
    )
    return sources, (txb, tyb, bwb)


def _two_row_decode(pk, bits, geo, cfg, lo, width):
    txb, tyb, bwb = bits
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    n_tiles = tx_n * ty_n
    iota_p = lo + jnp.arange(width, dtype=jnp.int32)
    pk_a, pk_b = pk
    pair_node = jnp.maximum(pk_a >> bwb, 0)
    nb_w = jnp.maximum(pk_a & ((1 << bwb) - 1), 1)
    p_first = pk_b >> (txb + tyb)
    p_tx0 = (pk_b >> tyb) & ((1 << txb) - 1)
    p_ty0 = pk_b & ((1 << tyb) - 1)
    pair_rank = iota_p - p_first
    pair_valid = iota_p < geo["n_pairs"]
    p_tx = jnp.minimum(p_tx0 + pair_rank % nb_w, tx_n)
    p_ty = jnp.minimum(p_ty0 + pair_rank // nb_w, ty_n)
    tile = jnp.where(
        pair_valid, jnp.minimum(p_ty * tx_n + p_tx, n_tiles), n_tiles
    )
    return tile, pair_node


def decode_one_row(geo, cfg, lo, width):
    """Variant B: single-row node-id scatter + 3-row attr gather."""
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    n_tiles = tx_n * ty_n
    first = geo["first"]
    tx0, ty0, bw = geo["tx0"], geo["ty0"], geo["bw"]
    iota_n, in_table, slot_w = _layout(geo, cfg, lo, width)
    iota_p = lo + jnp.arange(width, dtype=jnp.int32)
    tyb = max(1, (ty_n - 1).bit_length())
    marks = (
        jnp.full((width,), -1, jnp.int32)
        .at[slot_w]
        .set(iota_n, mode="drop", unique_indices=True)
    )
    before = in_table & (first < lo)
    carry = jnp.max(jnp.where(before, iota_n, _IMIN))
    (pk,) = _running_max_rows(marks[None, :])
    pair_node = jnp.maximum(jnp.maximum(pk, carry), 0)
    grows = jnp.stack([first, (tx0 << tyb) | ty0, bw])
    g = grows[:, pair_node]
    p_first = g[0]
    p_tx0 = g[1] >> tyb
    p_ty0 = g[1] & ((1 << tyb) - 1)
    nb_w = jnp.maximum(g[2], 1)
    pair_rank = iota_p - p_first
    pair_valid = iota_p < geo["n_pairs"]
    p_tx = jnp.minimum(p_tx0 + pair_rank % nb_w, tx_n)
    p_ty = jnp.minimum(p_ty0 + pair_rank // nb_w, ty_n)
    tile = jnp.where(
        pair_valid, jnp.minimum(p_ty * tx_n + p_tx, n_tiles), n_tiles
    )
    return tile, pair_node


def decode_two_row_t(geo, cfg, lo, width):
    """Variant C: the shipped two-row fill, but the scatter writes a
    TRANSPOSED [width, 2] marks array — per index one contiguous
    8-byte (1, 2) slice rather than two 4-byte strided elements."""
    iota_n, in_table, slot_w = _layout(geo, cfg, lo, width)
    first = geo["first"]
    sources, bits = _two_row_sources(geo, cfg, iota_n)
    marks_t = (
        jnp.full((width, 2), -1, jnp.int32)
        .at[slot_w, :]
        .set(sources.T, mode="drop", unique_indices=True)
    )
    marks = marks_t.T
    before = in_table & (first < lo)
    carry = jnp.max(jnp.where(before[None, :], sources, _IMIN), axis=1)
    pk = [
        jnp.maximum(r, c)
        for r, c in zip(_running_max_rows(marks), carry)
    ]
    return _two_row_decode(pk, bits, geo, cfg, lo, width)


def make_decode_grouped(G):
    """Variant D: GROUP-BLOCK fill. The scatter is per-index bound
    (~30 ns per in-bounds index, ~3 ns dropped) while shared-index
    gathers run ~1.5 ns/index, so scatter ONE mark per group of G
    consecutive nodes (their slot ranges are contiguous because
    `first` is monotone over the whole table) and recover the member
    node per slot from the group's gathered cumulative counts."""

    def decode(geo, cfg, lo, width):
        tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
        n_tiles = tx_n * ty_n
        pair_cap = cfg.pair_cap
        n_nodes = geo["n_nodes"]
        first, counts = geo["first"], geo["counts"]
        tx0, ty0, bw = geo["tx0"], geo["ty0"], geo["bw"]
        n_pairs = geo["n_pairs"]
        iota_p = lo + jnp.arange(width, dtype=jnp.int32)

        ng = -(-n_nodes // G)
        pad = ng * G - n_nodes
        cpad = jnp.concatenate(
            [counts, jnp.zeros((pad,), counts.dtype)]
        )
        cum_g = jnp.cumsum(cpad.reshape(ng, G), axis=1)  # inclusive
        gtotal = cum_g[:, -1]
        gfirst = first[::G]  # first slot of each group (dead-safe)
        iota_g = jnp.arange(ng, dtype=jnp.int32)
        in_table = (gtotal > 0) & (gfirst < pair_cap)
        in_win = in_table & (gfirst >= lo) & (gfirst < lo + width)
        slot_w = jnp.where(in_win, gfirst - lo, width + iota_g)
        marks = (
            jnp.full((width,), -1, jnp.int32)
            .at[slot_w]
            .set(iota_g, mode="drop", unique_indices=True)
        )
        before = in_table & (gfirst < lo)
        carry = jnp.max(jnp.where(before, iota_g, _IMIN))
        (pk,) = _running_max_rows(marks[None, :])
        g = jnp.maximum(jnp.maximum(pk, carry), 0)

        # gather 1 (by group): group slot start + G-1 member cums
        grows = jnp.concatenate(
            [gfirst[None, :], cum_g.T[:-1]], axis=0
        )  # [G, ng]
        gg = grows[:, g]
        rank_g = iota_p - gg[0]
        m = jnp.zeros_like(rank_g)
        node_off = jnp.zeros_like(rank_g)
        for k in range(G - 1):
            ge = rank_g >= gg[1 + k]
            m = m + ge.astype(jnp.int32)
            node_off = jnp.where(ge, gg[1 + k], node_off)
        pair_node = jnp.minimum(g * G + m, n_nodes - 1)
        pair_rank = rank_g - node_off

        # gather 2 (by node): the rect word
        tyb = max(1, (ty_n - 1).bit_length())
        bwb = tx_n.bit_length()
        xyw = (tx0 << (tyb + bwb)) | (ty0 << bwb) | bw
        w = xyw[pair_node]
        p_tx0 = w >> (tyb + bwb)
        p_ty0 = (w >> bwb) & ((1 << tyb) - 1)
        nb_w = jnp.maximum(w & ((1 << bwb) - 1), 1)
        pair_valid = iota_p < n_pairs
        p_tx = jnp.minimum(p_tx0 + pair_rank % nb_w, tx_n)
        p_ty = jnp.minimum(p_ty0 + pair_rank // nb_w, ty_n)
        tile = jnp.where(
            pair_valid, jnp.minimum(p_ty * tx_n + p_tx, n_tiles),
            n_tiles,
        )
        return tile, pair_node

    return decode


def frame_fn(decode_fn):
    """Full-frame pipeline identical on both sides except the fill."""
    n_tiles = cfg.tiles_x * cfg.tiles_y

    def fn(scene):
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
        origin, tl, tr, bl = corner_rays(
            scene.camera, cfg.width / cfg.height
        )
        ex, ey = tr - tl, bl - tl
        u1 = jnp.float32(cfg.padded_width / cfg.width)
        v1 = jnp.float32(cfg.padded_height / cfg.height)
        base = tl - origin
        corners = jnp.stack(
            [base + u * ex + v * ey
             for u in (jnp.float32(0.0), u1)
             for v in (jnp.float32(0.0), v1)]
        )
        geo = bin_geometry(nodes, minv, cfg, corners=corners)
        tile, pair_node = decode_fn(geo, cfg, 0, cfg.pair_cap)
        tile_sorted, node_sorted = _sort_pairs(
            tile, pair_node, geo["n_nodes"], n_tiles
        )
        rows = node_rows(nodes, cfg)
        pairs = rows[:, node_sorted]
        dead = tile_sorted >= n_tiles
        pairs = pairs.at[3, :].set(jnp.where(dead, -_BIG, pairs[3, :]))
        bounds = jnp.searchsorted(
            tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        )
        starts = bounds[:-1].astype(jnp.int32)
        lens = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
        cam = camera_vector(scene, cfg)
        out, _m = trace_pairs_fused_soa(cam, pairs, starts, lens, cfg)
        imgs = _untile_rows(out[:, :1], cfg)
        return imgs[0]

    return fn


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    fa = frame_fn(_decode_tiles_window)  # shipped two-row fill
    fd8 = frame_fn(make_decode_grouped(8))
    fd16 = frame_fn(make_decode_grouped(16))

    # Bit-parity gate on the min_t plane.
    mta = np.asarray(jax.jit(fa)(scene0))
    for name, f in (("D8", fd8), ("D16", fd16)):
        mt = np.asarray(jax.jit(f)(scene0))
        eq = np.array_equal(mta, mt)
        print(f"parity vs A (min_t bit-equal), {name}: {eq}")
        if not eq:
            diff = np.abs(mta - mt)
            print(f"  max |dt| {diff.max()}  differing px "
                  f"{(diff > 0).sum()}")
            return 1

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
                mt = body_fn(dataclasses.replace(scene, camera=cam))
                return acc + mt[5, 5] + mt[540, 960], None

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

    sides = {
        "A two-row fill ": fa,
        "D8 grouped fill": fd8,
        "D16 grouped    ": fd16,
    }
    fns = {}
    for name, body in sides.items():
        fns[name] = (make_scan(body, 2), make_scan(body, 22))
        t0 = time.perf_counter()
        run(fns[name][0])
        run(fns[name][1])
        print(f"compiled {name} ({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
    trials = {name: [] for name in sides}
    for _ in range(3):
        for name in sides:
            f2, f22 = fns[name]
            trials[name].append((run(f22) - run(f2)) / 20)
    rays = cfg.width * cfg.height
    for name in sides:
        ts = sorted(trials[name])
        med = ts[1]
        print(
            f"{name}: {med * 1e3:6.3f} ms/frame = "
            f"{rays / med / 1e6:6.1f}M rays/s   "
            f"trials {', '.join(f'{t * 1e3:.3f}' for t in ts)}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
