"""Binned traversal: frame-global expansion + screen-tile binning (XLA)
feeding ONE fully-fused Pallas kernel (raygen + ray tests + shading).

The per-tile kernel (`pallas_traversal.py`) re-expands the fractal for
every tile, so the tree walk near the root is repeated ~2000x per
frame. This path walks the tree ONCE per frame:

1. **Global expansion** (`expand_global`): dense SoA frontier per level
   (component arrays, no compaction — elementwise masked math is far
   cheaper on the VPU than sort-based compaction), culled by the
   whole-frame frustum and the conservative LOD bound. This is the
   reference's recursion (`Sphereflake.h:86-226`) with the screen for a
   packet.
2. **Binning** (`bin_nodes`): every live node's bounding sphere (radius
   2r, the reference's bounding test radius) is projected to a
   conservative screen-space tile range by exact interval arithmetic in
   the corner-ray basis (`Sphereflake.cpp:162-167` inverted);
   behind-camera nodes are dropped by a corner-ray dot cull; (node,
   tile) pairs are laid out by a packed-key sort into dense per-tile
   segments of a 7|8-row payload (all node-loop scalars precomputed). The binning is a conservative
   superset of the per-tile frustum cull, so results match the per-tile
   kernel.
3. **Fused kernel** (`trace_pairs_fused_soa` / `..._subset`): grid over
   tiles (or an arbitrary tile subset via an indirection table — the
   frameless mode); per-tile segment (start, len) arrives via scalar
   prefetch; the kernel derives its ray directions from 16 camera
   scalars, DMAs its pair window HBM->SMEM, runs a scalar-driven node
   loop (8 independent ILP chains over the precomputed fat-row
   payload — see `node_rows`), and shades the winner to (min_t,
   position, normal) in the epilogue. A frame's forward pass is
   expansion + binning + one Pallas dispatch + per-plane untiles.

(`trace_pairs_pallas`/`_soa` remain as the dirs-input variant for
progressive per-pixel bundles.) Select with
``RenderConfig(algorithm="binned")``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphereflake_tpu.config import FractalParams, RenderConfig

Array = Any
_BIG = np.float32(3.0e38)

PAIR_CAP = 1 << 20  # upper bound on cfg.pair_cap (20-bit fill packing;
# the remaining 11 bits cover tile grids to 2048 per axis = 64k^2 px)
SEG_WIN = 512  # pairs per kernel DMA window (segments of ANY length
# are consumed by looping windows — SEG_WIN is a staging-buffer size,
# not a correctness cap)
_UNROLL = 8  # independent node chains per loop iteration (VPU ILP)
_LANES = 128

# NOTE (round 4): a front-to-back segment ordering + in-kernel
# early-exit (stop a tile once every ray's best t beats the remaining
# candidates' conservative min distance) was implemented and measured
# +1.45 ms/frame SLOWER at 1080p: the lax.while_loop's per-quad
# cross-lane max reduction serializes the pipeline that the fori_loop's
# 8 independent chains otherwise keep full. Revisit only with a
# block-granular (>= 32-candidate) check or a two-phase design.


_IMIN = -(2**31)


def _cummax_last(x: Array) -> Array:
    """Inclusive running max along the LAST axis via log-shift maxima
    (log2(n) pad+slice+max passes). Both a flat 1D `lax.cummax` (lane-
    serial) and the 2D `lax.cummax` lowering (reduce-window, measured
    ~1.5 ms on [4, 147k]) are slow on TPU; this is ~10 bandwidth-bound
    elementwise ops."""
    n = x.shape[-1]
    pad_cfg = [(0, 0)] * (x.ndim - 1)
    sh = 1
    while sh < n:
        shifted = jnp.pad(
            x, pad_cfg + [(sh, 0)], constant_values=_IMIN
        )[..., :n]
        x = jnp.maximum(x, shifted)
        sh *= 2
    return x


def _running_max_rows(x: Array) -> Array:
    """Per-row inclusive running max over [K, n] int32: two-level
    decomposition ([K, rows, cols] log-shift cummax along cols +
    a small carry cummax over rows)."""
    k, n = x.shape
    rows = 1 << (max(n.bit_length() - 1, 2) // 2 + 1)
    cols = -(-n // rows)
    pad = rows * cols - n
    imin = jnp.int32(_IMIN)
    x2 = jnp.concatenate(
        [x, jnp.full((k, pad), imin, x.dtype)], axis=1
    ).reshape(k, rows, cols)
    row = _cummax_last(x2)
    carry = _cummax_last(row[:, :, -1])
    carry = jnp.concatenate(
        [jnp.full((k, 1), imin, x.dtype), carry[:, :-1]], axis=1
    )
    out = jnp.maximum(row, carry[:, :, None]).reshape(k, rows * cols)
    return tuple(out[i, :n] for i in range(k))


_POW7 = 9**7  # path-code hi/lo split: lo < 9^7 stays f32-exact
# Depth bound of the two-lane f32 path code: a level-d code (with its
# sentinel) lies in [9^d, 9^(d+1)), so at d = 13 hi = code // 9^7 stays
# below 9^7 = 4,782,969 < 2^24 and both lanes are f32-exact. d = 14
# would put hi in [9^7, 9^8) and 9^8 = 43,046,721 > 2^24 silently
# rounds codes to wrong nodes (round-3 advisor finding). 13 is also the
# physical f32 limit: level-13 spheres have radius 3^-13 ~ 6.3e-7,
# approaching the f32 relative-precision floor (eps ~ 1.2e-7) of the
# center coordinates themselves. The reference's recursion is unbounded
# in principle (`Sphereflake.h:146-153`) but its f32 math hits the same
# wall.
DEEP_MAX_DEPTH = 13


def _expand_cap(cfg: RenderConfig) -> int:
    """Pre-expansion live cap: once a level's children would exceed
    global_cap, the parents are compacted this hard first. global_cap
    defaults to exactly 9x this, so compacted parents' children fill
    the emitted level with NO second (emit-time) compaction sort."""
    return max(4096, cfg.global_cap // 9)


def expand_global(
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
    frame_planes: Array,  # [4, 3] inward unit planes of the whole frame
):
    """Levelwise SoA expansion of the whole LOD-passing tree.

    Levels stay DENSE (masked, no data movement) while their 9^l width
    fits `cfg.global_cap`; wider levels are compacted to the cap's
    CLOSEST live nodes before emission. Two jobs at once: (a) the
    binning stage downstream is index-bound (TPU scatters cost ~3-8
    ns/index), so feeding it ~73k node slots instead of the dense 597k
    is most of its speed; (b) the reference's UNBOUNDED LOD-terminated
    recursion depth (`Sphereflake.h:146-153`) becomes reachable — an
    approach dive to level 13 expands only the live frontier, never
    the 9^13 dense tree.

    Path codes ride two lanes (code = hi * 9^7 + lo) so depths past 7
    stay exact in f32 kernel rows (`DEEP_MAX_DEPTH` = 13).

    Returns (nodes dict with [N] component arrays over all levels
    concatenated — cx, cy, cz, cc, r2, code (lo, int32),
    code_hi (int32), live, rad — and the compaction overflow count).
    """
    assert cfg.max_depth <= DEEP_MAX_DEPTH, (
        f"binned path supports max_depth <= {DEEP_MAX_DEPTH} "
        "(two-lane path-code exactness)"
    )
    depth = cfg.max_depth
    cap = cfg.global_cap
    lod_sq = jnp.float32(cfg.lod_factor**2)
    ratio = fractal.radius_ratio
    radius0 = fractal.root_radius

    rot = [[templates[:, a, b] for b in range(3)] for a in range(3)]  # [9]
    disp = [templates[:, a, 3] for a in range(3)]

    # Level 0: the root frame.
    r = [jnp.broadcast_to(root[a, b], (1,)) for a in range(3) for b in range(3)]
    t = [jnp.broadcast_to(root[a, 3], (1,)) for a in range(3)]
    lo = jnp.ones((1,), jnp.int32)
    hi = jnp.zeros((1,), jnp.int32)
    live = jnp.ones((1,), bool)
    overflow = jnp.int32(0)

    out = {k: [] for k in ("cx", "cy", "cz", "cc", "r2", "code",
                            "code_hi", "live", "rad")}

    def cull(t, live, radius):
        cx, cy, cz = t
        cc = cx * cx + cy * cy + cz * cz
        # Whole-frame frustum + LOD cull (same conservative tests the
        # per-tile kernel applies, with the frame for a frustum).
        lim = lod_sq * radius + 2.0 * radius
        keep = live & (cc < lim * lim)
        for p in range(4):
            d_p = (
                frame_planes[p, 0] * cx
                + frame_planes[p, 1] * cy
                + frame_planes[p, 2] * cz
            )
            keep = keep & (d_p >= -2.0 * radius)
        return keep

    def emit(t, lo, hi, live, radius):
        cx, cy, cz = t
        n = cx.shape[0]
        out["cx"].append(cx)
        out["cy"].append(cy)
        out["cz"].append(cz)
        out["cc"].append(cx * cx + cy * cy + cz * cz)
        out["r2"].append(jnp.full((n,), 1.0, jnp.float32) * (radius * radius))
        out["code"].append(lo)
        out["code_hi"].append(hi)
        out["live"].append(live)
        out["rad"].append(jnp.full((n,), 1.0, jnp.float32) * (2.0 * radius))

    def compact(r, t, lo, hi, live, cap=cap):
        """Sort-and-gather compaction of live nodes to [cap] slots.

        One stable sort by (dead, distance) keys orders the closest
        live nodes first; a 14-row shared-index gather then moves the
        components (codes bitcast through f32). Sort + gather beat the
        scatter formulation ~3x on TPU (gathers ~0.6 ns/element vs
        scatters ~3 ns/index — docs/PERF.md), and the distance key
        makes the over-cap drop policy LOD-consistent: the FARTHEST
        nodes go, never the near subtree an approach dive exists to
        reveal.
        """
        n = live.shape[0]
        total_all = jnp.sum(live.astype(jnp.int32))
        cc = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
        key = jnp.where(live, cc, _BIG)
        _, idx = jax.lax.sort(
            (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=True,
        )
        idx = idx[:cap]
        f32 = jax.lax.bitcast_convert_type
        rows = jnp.stack(
            r + t + [f32(lo, jnp.float32), f32(hi, jnp.float32)]
        )  # [14, n]
        packed = rows[:, idx]  # [14, cap]
        total = jnp.minimum(total_all, cap)
        i32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
        new_live = jnp.arange(cap, dtype=jnp.int32) < total
        return (
            [packed[k] for k in range(9)],
            [packed[9 + a] for a in range(3)],
            i32(packed[12]),
            i32(packed[13]),
            new_live,
            jnp.maximum(total_all - cap, 0),
        )

    radius = radius0
    live = cull(t, live, radius)
    emit(t, lo, hi, live, radius)
    ecap = _expand_cap(cfg)
    for _level in range(depth):
        if 9 * live.shape[0] > cap and live.shape[0] > ecap:
            # Children would exceed the cap. Only parents that can
            # produce a LOD-passing child need to survive: a child's
            # emit cull needs |c_child| < lod^2*r_c + 2*r_c, and
            # |c_child| >= |c_parent| - (1+ratio)*r_p, so the gate
            # below is exactly conservative. At the reference pose
            # level 5 is ~59k live but ZERO of them can spawn live
            # level-6 children — this is what keeps the expansion (and
            # its compaction sort) ~9x ecap instead of 9x the dense
            # level width.
            r_c = radius * ratio
            lim = lod_sq * r_c + 2.0 * r_c + (1.0 + ratio) * radius
            cc_cur = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
            gate = live & (cc_cur < lim * lim)
            r, t, lo, hi, live, ovf = compact(r, t, lo, hi, gate, ecap)
            overflow = overflow + ovf
        scale = (1.0 + ratio) * radius
        # Children: [9, N] via broadcasting template constants.
        new_r = [
            sum(r[3 * a + k][None, :] * rot[k][b][:, None] for k in range(3))
            for a in range(3)
            for b in range(3)
        ]
        new_t = [
            sum(r[3 * a + k][None, :] * (scale * disp[k])[:, None]
                for k in range(3))
            + t[a][None, :]
            for a in range(3)
        ]
        j9 = jnp.arange(9, dtype=jnp.int32)[:, None]
        lo9 = lo[None, :] * 9 + j9
        carry = lo9 // _POW7
        lo = lo9 - carry * _POW7
        hi = hi[None, :] * 9 + carry
        n9 = lo.shape[0] * lo.shape[1]
        r = [x.reshape(n9) for x in new_r]
        t = [x.reshape(n9) for x in new_t]
        lo = lo.reshape(n9)
        hi = hi.reshape(n9)
        live = jnp.broadcast_to(live[None, :], (9, live.shape[0])).reshape(n9)
        radius = radius * ratio
        live = cull(t, live, radius)
        # Compact wide levels before emission too, so the binning
        # stage's arrays stay <= global_cap per level.
        if n9 > cap:
            r, t, lo, hi, live, ovf = compact(r, t, lo, hi, live)
            overflow = overflow + ovf
        emit(t, lo, hi, live, radius)

    nodes = {k: jnp.concatenate(v) for k, v in out.items()}
    return nodes, overflow


def corner_basis(cam, width: int, height: int):
    """Rows of M^-1 for the corner-ray basis: a camera-relative point c
    projects to screen uv' = (s0/s2, s1/s2) with s = M^-1 c, where
    M = [TR-TL | BL-TL | TL-origin] (`Sphereflake.cpp:162-167`)."""
    from sphereflake_tpu.camera import corner_rays

    origin, tl, tr, bl = corner_rays(cam, width / height)
    m = jnp.stack([tr - tl, bl - tl, tl - origin], axis=1)  # [3, 3]
    minv = jnp.linalg.inv(m)
    return minv


def _decode_tiles_window(geo, cfg: RenderConfig, lo: int, width: int):
    """Decode (tile, node) for pair slots [lo, lo + width) from the
    per-node geometry dict — the windowed heart of the pair fill.

    `bin_nodes` calls this with the full window (lo=0, width=pair_cap);
    the shared-bin sharded path (`parallel/shared_bin.py`) gives each
    device its own static slot window, with the running-max carry-in at
    the window boundary computed DIRECTLY from the node arrays (the
    carry at slot lo is the max packed source over nodes whose first
    slot precedes lo — a masked reduction, exact in int32), so the
    windowed decode is bit-identical to the full one.

    Live nodes have strictly increasing `first`, so in-bounds slots
    are UNIQUE — scatter with mode="drop" + unique_indices, all fill
    sources riding ONE batched scatter. Dead and overflowed nodes aim
    at width + their own index: out of bounds (dropped) but DISTINCT,
    so the uniqueness promise holds for every index (XLA makes
    duplicate indices UB when uniqueness is promised, even dropped
    ones — round-3 advisor finding).
    """
    pair_cap = cfg.pair_cap
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    n_tiles = tx_n * ty_n
    n_nodes = geo["n_nodes"]
    first, counts = geo["first"], geo["counts"]
    tx0, ty0, bw = geo["tx0"], geo["ty0"], geo["bw"]
    n_pairs = geo["n_pairs"]
    iota_n = jnp.arange(n_nodes, dtype=jnp.int32)
    in_table = (counts > 0) & (first < pair_cap)
    # Everything not landing INSIDE this window (dead, overflowed, or
    # out-of-window nodes alike) aims at width + its own index: out of
    # bounds (dropped) but DISTINCT from every in-window slot and from
    # each other, preserving the uniqueness promise.
    in_win = in_table & (first >= lo) & (first < lo + width)
    slot_w = jnp.where(in_win, first - lo, width + iota_n)
    iota_p = lo + jnp.arange(width, dtype=jnp.int32)

    assert pair_cap <= PAIR_CAP
    # Scatter width is the bin stage's main cost (~3 ns per scattered
    # element), so pack as tightly as the STATIC bit budgets allow:
    # the fill only needs each packed word monotone over slots, and
    # both `iota_n` (node id) and `first` are strictly increasing —
    # either works as the high-bits carrier.
    nbits = max(1, (n_nodes - 1).bit_length())
    fbits_c = max(1, (pair_cap - 1).bit_length())
    txb = max(1, (tx_n - 1).bit_length())
    tyb = max(1, (ty_n - 1).bit_length())
    bwb = tx_n.bit_length()  # bw in [1, tx_n]
    two_rows = (nbits + bwb <= 31) and (fbits_c + txb + tyb <= 31)
    if two_rows:
        # Row A: (node << bwb) | bw; row B: (first << txb+tyb) |
        # (tx0 << tyb) | ty0 — the whole decode from TWO scans.
        sources = jnp.stack(
            [
                (iota_n << bwb) | bw,
                (first << (txb + tyb)) | (tx0 << tyb) | ty0,
            ]
        )
    else:
        # Fallback (very large grids/caps): one attribute per scan,
        # `first` carrying the monotone high bits of each.
        abits = 31 - fbits_c
        # Strict: a node spanning the full grid width has bw == tx_n,
        # so tx_n itself must fit the pack field — tx_n == 1<<abits
        # would silently clamp that node's width and drop its last tile
        # column (round-4 advisor finding).
        assert tx_n < (1 << abits) and ty_n < (1 << abits), (
            f"tile grid {tx_n}x{ty_n} exceeds the {abits}-bit pack budget"
        )
        amask = (1 << abits) - 1
        sources = jnp.stack(
            [
                iota_n,  # node id
                (first << abits) | tx0,
                (first << abits) | ty0,
                (first << abits) | bw,
            ]
        )
    k = sources.shape[0]
    marks = (
        jnp.full((k, width), -1, jnp.int32)
        .at[:, slot_w]
        .set(sources, mode="drop", unique_indices=True)
    )
    # Boundary carry: the running max entering this window = the max
    # source among nodes scattered before it (int32 max, exact; empty
    # at lo = 0, where the mask is all-False and the max is _IMIN).
    # `lo` may be traced (the shared-bin path passes each device's
    # window start).
    before = in_table & (first < lo)
    carry = jnp.max(jnp.where(before[None, :], sources, _IMIN), axis=1)
    pk = [
        jnp.maximum(r, c)
        for r, c in zip(_running_max_rows(marks), carry)
    ]
    if two_rows:
        pk_a, pk_b = pk
        pair_node = jnp.maximum(pk_a >> bwb, 0)
        nb_w = jnp.maximum(pk_a & ((1 << bwb) - 1), 1)
        p_first = pk_b >> (txb + tyb)
        p_tx0 = (pk_b >> tyb) & ((1 << txb) - 1)
        p_ty0 = pk_b & ((1 << tyb) - 1)
    else:
        pair_node, pk_x0, pk_y0, pk_bw = pk
        pair_node = jnp.maximum(pair_node, 0)
        p_first = pk_x0 >> abits
        p_tx0 = pk_x0 & amask
        p_ty0 = pk_y0 & amask
        nb_w = jnp.maximum(pk_bw & amask, 1)
    pair_rank = iota_p - p_first
    pair_valid = iota_p < n_pairs  # offsets are gapless
    # Overflowed tails can decode garbage coordinates — clip each axis
    # (avoiding i32 overflow in the tile index product) so they land on
    # the sentinel and sort to the end (overflow is counted anyway).
    p_tx = jnp.minimum(p_tx0 + pair_rank % nb_w, tx_n)
    p_ty = jnp.minimum(p_ty0 + pair_rank // nb_w, ty_n)
    tile = jnp.where(
        pair_valid, jnp.minimum(p_ty * tx_n + p_tx, n_tiles), n_tiles
    )
    return tile, pair_node


def _sort_pairs(tile, pair_node, n_nodes: int, n_tiles: int):
    """One sort into tile-segment order. Packed single key (tile <<
    node_bits | node) when both fit 31 bits (halves the sort's data
    movement vs the two-array variadic sort); the argsort-then-gather
    form costs two extra big random gathers for the same result."""
    node_bits = max(1, (n_nodes - 1).bit_length())
    tile_bits = (n_tiles + 1).bit_length()
    if node_bits + tile_bits <= 31:
        packed = (tile << node_bits) | pair_node
        packed = jax.lax.sort(packed)
        tile_sorted = packed >> node_bits
        node_sorted = packed & ((1 << node_bits) - 1)
    else:
        tile_sorted, node_sorted = jax.lax.sort(
            (tile, pair_node), num_keys=1
        )
    return tile_sorted, node_sorted


def node_rows(nodes, cfg: RenderConfig):
    """The fat-rows node attribute matrix [7|8, N] the pair gather
    pulls from.

    Layout (round 5, "fat rows"): every scalar the kernel's node loop
    consumes rides the pair table — (cx, cy, cz, rc = r2 - cc,
    code[, code_hi], lodr = lod^2*r, rc4 = 4r^2 - cc), 7 rows (8 past
    depth 6). Round 4 shipped a 5-row payload with the kernel
    re-deriving rc/rc4/lodr on the scalar unit (~15 scalar ops + a
    scalar sqrt per candidate) on the bet that the scalar unit rode
    free beside the VPU; the node loop is scalar-co-limited, so
    precomputing the derived rows (one elementwise pass over ~73k
    nodes, plus 2 more gathered rows) trades a little bin time for
    kernel time — measured by tools/fatrows_probe.py (interleaved
    A/B; numbers in docs/PERF.md round 5). The DMA cost is unchanged:
    the 5-row payload was already padded to 8 rows for Mosaic's 8-row
    slice alignment, so the fat rows fill slots that previously
    shipped zeros."""
    deep_rows = cfg.max_depth >= 7
    lod_sq_f = jnp.float32(np.float32(cfg.lod_factor) ** 2)
    cc_n = nodes["cc"]
    r2_n = nodes["r2"]
    row_list = [
        nodes["cx"], nodes["cy"], nodes["cz"],
        r2_n - cc_n,
        nodes["code"].astype(jnp.float32),
    ]
    if deep_rows:
        row_list.append(nodes["code_hi"].astype(jnp.float32))
    row_list.append(lod_sq_f * jnp.sqrt(jnp.maximum(r2_n, 0.0)))
    row_list.append(4.0 * r2_n - cc_n)
    return jnp.stack(row_list)


def bin_nodes(nodes, minv, cfg: RenderConfig, frame=None, corners=None):
    """Conservative (node, tile) pairing + one sort into tile segments.

    `frame` = (frame_w, frame_h, x_off, y_off) describes the full image
    this cfg's block is cut from (sharded rendering: each device bins
    into its own block's tiles, offset by (x_off, y_off) pixels within
    the frame whose corner-ray basis `minv` was built from). Defaults
    to the unsharded identity (cfg.width, cfg.height, 0, 0).

    `corners` = [4, 3] frame corner-ray directions (unnormalized is
    fine). When given, nodes BEHIND every corner ray are dropped: the
    kernel (like the reference, `SIMD_AVX.h:245-249`) rejects
    tca = dot(c, dir) < 0, and tca is linear in dir over the frustum
    (every frame ray is a convex combination of the corners), so
    max_i dot(c, corner_i) < 0 proves no frame ray can hit the node.
    Without this cull, behind-camera nodes take the ENTIRE tile grid
    (the conservative straddle fallback), which multiplied the pair
    table by the tile count at interior poses (round-3 verdict #8).

    Returns (pairs [7|8, cfg.pair_cap], starts [T], lens [T], n_pairs,
    pair_overflow)."""
    pair_cap = cfg.pair_cap
    n_tiles = cfg.tiles_x * cfg.tiles_y
    geo = bin_geometry(nodes, minv, cfg, frame=frame, corners=corners)
    n_pairs, pair_overflow = geo["n_pairs"], geo["pair_overflow"]
    n_nodes = geo["n_nodes"]
    tile, pair_node = _decode_tiles_window(geo, cfg, 0, pair_cap)
    tile_sorted, node_sorted = _sort_pairs(tile, pair_node, n_nodes, n_tiles)
    rows = node_rows(nodes, cfg)  # [7|8, N]
    pairs = rows[:, node_sorted]  # [R, pair_cap]
    # Dead pairs (tile == n_tiles) sit at the end; starts/lens ignore
    # them, but stamp r2 = -BIG defensively (disc = tca^2 + r2 - cc
    # can then never reach 0) so no ray test — nor an unrolled-tail or
    # window-overshoot read — can ever pass.
    dead = tile_sorted >= n_tiles
    pairs = pairs.at[3, :].set(jnp.where(dead, -_BIG, pairs[3, :]))

    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    )
    starts, lens = bounds[:-1], bounds[1:] - bounds[:-1]
    return pairs, starts.astype(jnp.int32), lens.astype(jnp.int32), (
        n_pairs, pair_overflow
    )


def bin_geometry(nodes, minv, cfg: RenderConfig, frame=None, corners=None):
    """Per-node screen-space geometry of the pair fill (all elementwise
    — no scatters/sorts): conservative tile ranges from interval
    arithmetic in the corner-ray basis, the behind-camera cull, and
    the pair-slot layout (counts / first / n_pairs). Shared between
    `bin_nodes` (full window) and the shared-bin sharded path
    (`parallel/shared_bin.py`, per-device slot windows)."""
    pair_cap = cfg.pair_cap
    tw, th = cfg.tile_w, cfg.tile_h
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    frame_w, frame_h, x_off, y_off = (
        frame if frame is not None else (cfg.width, cfg.height, 0.0, 0.0)
    )
    # NDC scale: uv' of 1.0 = frame_w pixels (original dims); the block
    # offset shifts pixel coords into block-local tile units.
    sx = frame_w / tw
    sy = frame_h / th
    ox = x_off / tw
    oy = y_off / th

    c = [nodes["cx"], nodes["cy"], nodes["cz"]]
    # Binning radius = 2r (the reference's bounding radius), NOT the
    # self radius r, even though only self-hits are tested: the f32
    # kernel's disc = tca^2 + (r^2 - |c|^2) suffers catastrophic
    # cancellation (|tca| ~ |c| ~ 8), so rays up to
    # ~|c|^2 * eps / (2r) OUTSIDE the exact r-sphere can still
    # register tangent "hits". The extra r of binning margin is what
    # keeps those numerically-borderline grazes deterministic across
    # band/shard layouts (tightening to r produced band-count-dependent
    # images at silhouettes — round-4 finding).
    rad = nodes["rad"]
    s = [
        minv[k, 0] * c[0] + minv[k, 1] * c[1] + minv[k, 2] * c[2]
        for k in range(3)
    ]
    mnorm = [jnp.sqrt(jnp.sum(minv[k] * minv[k])) for k in range(3)]
    ds = [mnorm[k] * rad for k in range(3)]

    # Interval arithmetic on u' = s0/s2, v' = s1/s2 over the sphere.
    s2_lo = s[2] - ds[2]
    s2_hi = s[2] + ds[2]
    front = s2_lo > 0.0  # safely in front of the camera plane

    def ratio_bounds(num, dnum):
        n_lo, n_hi = num - dnum, num + dnum
        cands = [
            n_lo / s2_lo, n_lo / s2_hi, n_hi / s2_lo, n_hi / s2_hi
        ]
        return (
            jnp.minimum(jnp.minimum(cands[0], cands[1]),
                        jnp.minimum(cands[2], cands[3])),
            jnp.maximum(jnp.maximum(cands[0], cands[1]),
                        jnp.maximum(cands[2], cands[3])),
        )

    u_lo, u_hi = ratio_bounds(s[0], ds[0])
    v_lo, v_hi = ratio_bounds(s[1], ds[1])

    # Tile ranges (conservative; behind-camera nodes take everything).
    # Tiles are indexed over this block's padded grid.
    tx0 = jnp.clip(jnp.floor(u_lo * sx - ox).astype(jnp.int32), 0, tx_n - 1)
    tx1 = jnp.clip(jnp.floor(u_hi * sx - ox).astype(jnp.int32), 0, tx_n - 1)
    ty0 = jnp.clip(jnp.floor(v_lo * sy - oy).astype(jnp.int32), 0, ty_n - 1)
    ty1 = jnp.clip(jnp.floor(v_hi * sy - oy).astype(jnp.int32), 0, ty_n - 1)
    tx0 = jnp.where(front, tx0, 0)
    ty0 = jnp.where(front, ty0, 0)
    tx1 = jnp.where(front, tx1, tx_n - 1)
    ty1 = jnp.where(front, ty1, ty_n - 1)
    bw = tx1 - tx0 + 1
    keep = nodes["live"]
    if corners is not None:
        cd = jnp.full_like(c[0], -1.0)
        for i in range(4):
            cd = jnp.maximum(
                cd,
                corners[i, 0] * c[0] + corners[i, 1] * c[1]
                + corners[i, 2] * c[2],
            )
        keep = keep & (cd >= 0.0)
    counts = jnp.where(keep, bw * (ty1 - ty0 + 1), 0)

    offsets = jnp.cumsum(counts)  # inclusive
    n_pairs = offsets[-1]
    pair_overflow = jnp.maximum(n_pairs - pair_cap, 0)

    # pair -> (node, tile), GATHER-FREE: per-pair gathers of node
    # attributes cost ~20-40 ns/element on this TPU REGARDLESS of
    # index locality (a round-4 attempt to replace this fill with two
    # "cache-friendly" gathers of packed words cost +2.6 ms/frame —
    # TPU gathers are not CPU gathers). Instead, scatter each live
    # node's attributes at its FIRST pair slot and fill the gaps with
    # running maxima: `first` is strictly increasing over live nodes,
    # so packing attr into the low bits of (first << k | attr) makes
    # each fill a monotone max-scan — 4 scans + 4 scatters, all
    # bandwidth-bound.
    first = offsets - counts
    n_nodes = counts.shape[0]
    return dict(
        tx0=tx0, ty0=ty0, bw=bw, counts=counts, first=first,
        n_pairs=n_pairs, n_nodes=n_nodes, pair_overflow=pair_overflow,
    )


def make_pairs_kernel(win: int, n_tiles: int, deep: bool = False,
                      group: int = 8, fused=None,
                      indirect: bool = False, shade_only: bool = False):
    """Kernel body v3: windowed node loop, overlapped DMA, ILP, and
    `group` tiles per grid step.

    - **Segments of any length.** The tile's pair segment is consumed
      in `win`-pair windows (`lax.fori_loop` over windows), so no
      window cap can drop geometry — the round-2 SEG_WIN overflow
      failure mode is gone (and progressive-mode bundle spans, which
      cover many tiles, work on this kernel).
    - **DMA overlapped with compute.** Window 0 of tile k+1 is
      prefetched into the other half of a double SMEM buffer while
      tile k's node loop runs (scratch persists across TPU grid
      steps); only the rare windows >= 1 (segments longer than `win`)
      pay their DMA latency inline.
    - **ILP via independent node chains.** Each loop iteration tests
      `_UNROLL` nodes against the ray vreg into separate (t, code)
      accumulators, merged after the loop — the serial min-select
      dependence of the round-2 kernel left the VPU idle between
      nodes. Per-node constants (rc, rc4, lodr) arrive precomputed in
      the fat-row payload (`node_rows`) — the node loop is
      scalar-co-limited, so deriving them here cost real time
      (round-5 A/B).
    - **`group` tiles per grid step** amortize the per-step prologue:
      at ~59 candidates/tile the node loop runs ~0.3 us while the
      per-step overhead was ~2.6 us — one step per tile left the VPU
      idle 85% of the frame. `n_tiles` must be a multiple of `group`
      (the wrapper pads; zero-length padded tiles cost two scalar
      reads).
    - **`deep` adds the hi code lane** (depth > 7): row 7 carries
      code_hi and each chain selects one more accumulator.
    - **The winner's center rides along** (cx, cy, cz accumulators —
      the components are already loaded for `tca`): the forward pass
      then needs NO `resolve_codes` re-walk at all; gradients recompute
      it in the custom VJP (`binned_trace_vjp`).
    - **`fused` = (tile_w, tile_h, tiles_x) fuses RAYGEN and SHADING
      into the kernel** (the full-frame production mode): instead of a
      dirs input, a 16-scalar camera vector arrives via scalar
      prefetch — [tl(3), ex(3), ey(3), origin(3), x_off, y_off,
      frame_w, frame_h] — and each tile derives its ray directions
      from its own grid position (`Sphereflake.cpp:162-167` corner
      interpolation, the same association order as the XLA raygen so
      the two agree to the last ulp). The epilogue converts the winner
      rows to the G-buffer directly: (min_t, lo[, hi], pos3, nrm3).
      This removes the entire XLA raygen/tile/shade stage — tens of
      dispatch-overhead-bound ops per frame on this backend.
    """
    assert n_tiles % group == 0
    # `shade_only` (fused only): the caller needs just (min_t, pos,
    # nrm) — the frameless refresh unit (`runtime/progressive.py`),
    # whose state never stores path codes. Dropping the code (and deep
    # hi) accumulator saves 1-2 vector selects per candidate in the
    # hot loop and shrinks the output to 7 rows.
    assert not (shade_only and fused is None)
    stride = 4 if shade_only else (6 if deep else 5)
    buf_w = win + _LANES + _UNROLL  # aligned window + unroll overshoot
    if fused is not None:
        tile_w, tile_h, tiles_x = fused
        assert tile_w & (tile_w - 1) == 0 and tile_w * tile_h == 1024

    def kernel(*refs):
        if fused is not None and indirect:
            (starts_ref, lens_ref, cam_ref, tmap_ref, pairs_ref,
             out_ref, mout_ref, qf, qr, sem_f, sem_r) = refs
            dirs_ref = None
        elif fused is not None:
            (starts_ref, lens_ref, cam_ref, pairs_ref, out_ref,
             mout_ref, qf, qr, sem_f, sem_r) = refs
            dirs_ref = None
            tmap_ref = None
        else:
            (starts_ref, lens_ref, dirs_ref, pairs_ref, out_ref,
             mout_ref, qf, qr, sem_f, sem_r) = refs
            tmap_ref = None
        i = pl.program_id(0)
        big = jnp.full((8, _LANES), _BIG, jnp.float32)
        zero = jnp.zeros((8, _LANES), jnp.float32)

        def tid_of(k):
            # Indirect mode (sparse tile subsets, the frameless
            # tile-progressive path): grid position k renders FRAME
            # tile tmap[k]; starts/lens stay full-frame arrays.
            return tmap_ref[k] if indirect else k

        def first_dma(tile_idx, dst_slot):
            st = starts_ref[tid_of(tile_idx)]
            base = pl.multiple_of((st // _LANES) * _LANES, _LANES)
            return pltpu.make_async_copy(
                pairs_ref.at[:, pl.ds(base, win + _LANES)],
                qf.at[dst_slot, :, : win + _LANES],
                sem_f.at[dst_slot],
            )

        @pl.when(i == 0)
        def _():
            first_dma(0, 0).start()

        for g in range(group):
            tile = i * group + g
            slot = g & 1  # == tile % 2 for even `group`
            first_dma(tile, slot).wait()
            # Overlap the next tile's first window with this node loop.
            @pl.when(tile + 1 < n_tiles)
            def _():
                first_dma(tile + 1, 1 - slot).start()

            tid = tid_of(tile)
            start = starts_ref[tid]
            length = lens_ref[tid]
            if fused is None:
                dx = dirs_ref[g, 0]
                dy = dirs_ref[g, 1]
                dz = dirs_ref[g, 2]
            else:
                # In-kernel raygen: this tile's pixel block, corner
                # interpolation from 12 camera scalars. Same op order
                # as `render._render_gbuffer_soa` raygen.
                txs = jax.lax.rem(tid, tiles_x)
                tys = jax.lax.div(tid, tiles_x)
                sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
                lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
                flat = sub * _LANES + lane
                col = jax.lax.bitwise_and(flat, tile_w - 1)
                row = jax.lax.shift_right_logical(
                    flat, tile_w.bit_length() - 1
                )
                fpx = (txs * tile_w + col).astype(jnp.float32)
                fpy = (tys * tile_h + row).astype(jnp.float32)
                u = (fpx + cam_ref[12]) / cam_ref[14]
                v = (fpy + cam_ref[13]) / cam_ref[15]
                dx = (cam_ref[0] + (cam_ref[3] * u + cam_ref[6] * v)) - cam_ref[9]
                dy = (cam_ref[1] + (cam_ref[4] * u + cam_ref[7] * v)) - cam_ref[10]
                dz = (cam_ref[2] + (cam_ref[5] * u + cam_ref[8] * v)) - cam_ref[11]
                dnorm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                dx = dx / dnorm
                dy = dy / dnorm
                dz = dz / dnorm
            n_win = (length + win - 1) // win

            def window(w, acc, from_first, start=start, length=length,
                       dx=dx, dy=dy, dz=dz, slot=slot):
                wstart = start + w * win
                base = pl.multiple_of((wstart // _LANES) * _LANES, _LANES)
                off = wstart - base
                cnt = jnp.minimum(length - w * win, win)

                def load(r, idx):
                    return qf[slot, r, idx] if from_first else qr[r, idx]

                def node_quad(q, acc):
                    acc = list(acc)
                    for u in range(_UNROLL):
                        k = q * _UNROLL + u
                        idx = off + k
                        cx = load(0, idx)
                        cy = load(1, idx)
                        cz = load(2, idx)
                        code = None if shade_only else load(4, idx)
                        # Fat-rows payload: rc / lodr / rc4 arrive
                        # precomputed per node (round 4 derived them
                        # here, ~15 scalar ops + a scalar sqrt per
                        # candidate — see the bin_nodes comment and
                        # docs/PERF.md round 5 for the A/B).
                        # The tail gate (k < cnt) folds into the
                        # SCALAR rc: rc = -BIG makes disc < 0 for
                        # every lane, saving two vector ops per
                        # candidate in the hot loop.
                        rc = jnp.where(k < cnt, load(3, idx), -_BIG)
                        lodr = load(6 if deep else 5, idx)
                        rc4 = load(7 if deep else 6, idx)
                        tca = dx * cx + dy * cy + dz * cz
                        t2 = tca * tca
                        disc = t2 + rc  # r^2 - d^2
                        c1 = tca - lodr
                        # `SIMD_AVX.h:236-270` + the sqrt-free LOD
                        # gate. max(c1,0)^2 < t2+rc4 is equivalent to
                        # (c1<0) | (c1^2 < t2+rc4) UNDER disc >= 0
                        # (disc >= 0 forces t2+rc4 >= 3r^2 > 0), one
                        # vector op cheaper. NOTE (round 5): folding
                        # the tca/disc gates into min(tca, disc) >= 0
                        # and dropping the sqrt clamp (ok masks the
                        # NaN) is bit-identical but measured 0.93x
                        # SLOWER (tools/optrim_probe.py) — Mosaic
                        # already schedules the compares well and the
                        # min adds a dependency; keep this form.
                        c1p = jnp.maximum(c1, 0.0)
                        lod_ok = c1p * c1p < t2 + rc4
                        ok = (tca >= 0.0) & lod_ok & (disc >= 0.0)
                        ts = tca - jnp.sqrt(jnp.maximum(disc, 0.0))
                        a = stride * u
                        bt = acc[a]
                        better = ok & (ts < bt)
                        sel = lambda new, old: jnp.where(better, new, old)
                        acc[a] = sel(ts, bt)
                        if not shade_only:
                            acc[a + 1] = sel(code, acc[a + 1])
                            if deep:
                                acc[a + 2] = sel(load(5, idx), acc[a + 2])
                        b = a + stride - 3
                        acc[b] = sel(cx, acc[b])
                        acc[b + 1] = sel(cy, acc[b + 1])
                        acc[b + 2] = sel(cz, acc[b + 2])
                    return tuple(acc)

                nq = (cnt + _UNROLL - 1) // _UNROLL
                return jax.lax.fori_loop(0, nq, node_quad, acc,
                                         unroll=False)

            acc0 = (
                (big,) + (zero,) * (stride - 1)
            ) * _UNROLL
            acc = window(0, acc0, from_first=True)

            def rest_body(w, acc, start=start):
                wstart = start + w * win
                base = pl.multiple_of(
                    (wstart // _LANES) * _LANES, _LANES
                )
                cp = pltpu.make_async_copy(
                    pairs_ref.at[:, pl.ds(base, win + _LANES)],
                    qr.at[:, : win + _LANES],
                    sem_r,
                )
                cp.start()
                cp.wait()
                return window(w, acc, from_first=False)

            acc = jax.lax.fori_loop(
                1, n_win, rest_body, acc, unroll=False
            )

            best = list(acc[:stride])
            for u in range(1, _UNROLL):
                take = acc[stride * u] < best[0]
                for c in range(stride):
                    best[c] = jnp.where(take, acc[stride * u + c], best[c])
            if fused is None:
                for c in range(stride):
                    out_ref[g, c] = best[c]
            elif shade_only:
                # Code-free epilogue: hit = "any candidate beat the
                # _BIG init" (every accepted ts is a real distance,
                # orders of magnitude below _BIG). Rows: (min_t, pos3,
                # nrm3) — exactly the frameless state layout.
                bt = best[0]
                bcx, bcy, bcz = best[1], best[2], best[3]
                hitv = bt < 0.5 * _BIG
                t0 = jnp.where(hitv, bt, 0.0)
                pxv, pyv, pzv = dx * t0, dy * t0, dz * t0
                wx, wy, wz = pxv - bcx, pyv - bcy, pzv - bcz
                nn = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 0.0))
                nn = jnp.where(nn > 0.0, nn, 1.0)
                hf = hitv.astype(jnp.float32)
                out_ref[g, 0] = bt
                out_ref[g, 1] = pxv
                out_ref[g, 2] = pyv
                out_ref[g, 3] = pzv
                out_ref[g, 4] = hf * (wx / nn)
                out_ref[g, 5] = hf * (wy / nn)
                out_ref[g, 6] = hf * (wz / nn)
            else:
                # In-kernel G-buffer shading (`render.shade_gbuffer`
                # math): position = dir * t (camera-relative,
                # `Sphereflake.cpp:186-195`), normal = (pos - center)
                # normalized, zeros at sky.
                bt, blo = best[0], best[1]
                bcx, bcy, bcz = best[-3], best[-2], best[-1]
                hitv = blo >= 1.0
                if deep:
                    hitv = hitv | (best[2] >= 1.0)
                t0 = jnp.where(hitv, bt, 0.0)
                pxv, pyv, pzv = dx * t0, dy * t0, dz * t0
                wx, wy, wz = pxv - bcx, pyv - bcy, pzv - bcz
                nn = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 0.0))
                nn = jnp.where(nn > 0.0, nn, 1.0)
                hf = hitv.astype(jnp.float32)
                out_ref[g, 0] = jnp.where(hitv, bt, _BIG)
                out_ref[g, 1] = blo
                base_c = 2
                if deep:
                    out_ref[g, 2] = best[2]
                    base_c = 3
                out_ref[g, base_c + 0] = pxv
                out_ref[g, base_c + 1] = pyv
                out_ref[g, base_c + 2] = pzv
                out_ref[g, base_c + 3] = hf * (wx / nn)
                out_ref[g, base_c + 4] = hf * (wy / nn)
                out_ref[g, base_c + 5] = hf * (wz / nn)
            mout_ref[g, 0] = length
            mout_ref[g, 1] = jnp.int32(0)  # windowed: nothing can drop
            mout_ref[g, 2] = jnp.int32(0)
            mout_ref[g, 3] = jnp.int32(0)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_pairs_pallas(
    tile_dirs: Array,  # [T, 1024, 3]
    pairs: Array,  # [7|8, cfg.pair_cap]
    starts: Array,  # [T] int32
    lens: Array,  # [T] int32
    cfg: RenderConfig,
    interpret: bool = False,
):
    """Per-tile ray tests against binned segments (AoS dirs wrapper).
    Returns (min_t [T, 1024], code_lo [T, 1024], code_hi [T, 1024] or
    None, metrics [T, 1, 4]). (The SoA core also carries the winner's
    center — rows [-3:] — which this wrapper drops.)"""
    T, rays, _ = tile_dirs.shape
    assert rays == 1024
    dirs_k = jnp.moveaxis(tile_dirs, 2, 1).reshape(T, 3, 8, _LANES)
    out, metrics = trace_pairs_pallas_soa(
        dirs_k, pairs, starts, lens, cfg, interpret=interpret
    )
    deep = cfg.max_depth >= 7
    code_hi = out[:, 2].reshape(T, rays) if deep else None
    return (
        out[:, 0].reshape(T, rays),
        out[:, 1].reshape(T, rays),
        code_hi,
        metrics,
    )


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_pairs_pallas_soa(
    dirs_k: Array,  # [T, 3, 8, 128] lane-major
    pairs: Array,  # [7|8, cfg.pair_cap]
    starts: Array,  # [T] int32
    lens: Array,  # [T] int32
    cfg: RenderConfig,
    interpret: bool = False,
):
    """SoA core: returns (out [T, C, 8, 128], metrics [T, 1, 4]) with
    rows (t, code_lo[, code_hi], cx, cy, cz): C = 6 when
    cfg.max_depth >= 7, else 5.

    The hi lane is needed from depth 7 onward (not 8): `expand_global`
    carries lo9 // 9^7 unconditionally, so LEVEL-7 codes already spill
    their sentinel into hi — dropping it at max_depth == 7 misreported
    level-7 hits as misses (round-3 advisor finding)."""
    T = dirs_k.shape[0]
    deep = cfg.max_depth >= 7
    n_out = 6 if deep else 5
    n_rows = 8 if deep else 7  # fat-rows payload (see bin_nodes)
    group = 8
    Tp = -(-T // group) * group
    sg = jax.lax.stop_gradient
    dirs_t, pairs = sg((dirs_k, pairs))
    if Tp != T:
        dirs_t = jnp.concatenate(
            [dirs_t, jnp.zeros((Tp - T, 3, 8, _LANES), dirs_t.dtype)]
        )
        starts = jnp.concatenate(
            [starts, jnp.zeros((Tp - T,), starts.dtype)]
        )
        lens = jnp.concatenate([lens, jnp.zeros((Tp - T,), lens.dtype)])
    # Pad so the last window's DMA never reads out of bounds; padding
    # carries r2 = -BIG so no test can pass on it.
    # Mosaic DMA slices must be 8-row aligned: pad the 7 gathered
    # rows to 8 with zero rows the kernel never reads (the zero rows
    # cost DMA bandwidth, not gather time — bandwidth is not the
    # bottleneck, the ~2.3 ns/element gather is).
    if n_rows < 8:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((8 - n_rows, pairs.shape[1]), pairs.dtype)],
            axis=0,
        )
    pad = jnp.zeros((8, SEG_WIN + _LANES), pairs.dtype)
    pad = pad.at[3, :].set(-_BIG)
    pairs_pad = jnp.concatenate([pairs, pad], axis=1)

    buf_w = SEG_WIN + _LANES + _UNROLL
    kernel = make_pairs_kernel(SEG_WIN, Tp, deep=deep, group=group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tp // group,),
        in_specs=[
            pl.BlockSpec(
                (group, 3, 8, _LANES),
                lambda i, s, l: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (group, n_out, 8, _LANES),
                lambda i, s, l: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, 4), lambda i, s, l: (i, 0),
                memory_space=pltpu.SMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((2, 8, buf_w), jnp.float32),
            pltpu.SMEM((8, buf_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, metrics = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, n_out, 8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 4), jnp.int32),
        ),
        interpret=interpret,
    )(starts, lens, dirs_t, pairs_pad)
    return out[:T], metrics[:T].reshape(T, 1, 4)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_pairs_fused_soa(
    cam: Array,  # [16] f32: tl(3), ex(3), ey(3), origin(3), x_off,
    # y_off, frame_w, frame_h
    pairs: Array,  # [7|8, cfg.pair_cap]
    starts: Array,  # [T] int32
    lens: Array,  # [T] int32
    cfg: RenderConfig,
    interpret: bool = False,
):
    """Fully fused production kernel: raygen + ray tests + G-buffer
    shading in ONE pallas_call (no dirs array ever exists in HBM).
    Returns (out [T, C, 8, 128], metrics [T, 1, 4]) with rows
    (min_t, code_lo[, code_hi], px, py, pz, nx, ny, nz):
    C = 9 when cfg.max_depth >= 7, else 8. min_t is _BIG at sky;
    pos/nrm are zeros at sky (`Sphereflake.cpp:186-201` semantics)."""
    T = cfg.tiles_y * cfg.tiles_x
    deep = cfg.max_depth >= 7
    n_out = 9 if deep else 8
    n_rows = 8 if deep else 7  # fat-rows payload (see bin_nodes)
    group = 8
    Tp = -(-T // group) * group
    sg = jax.lax.stop_gradient
    cam, pairs = sg((cam, pairs))
    if Tp != T:
        starts = jnp.concatenate(
            [starts, jnp.zeros((Tp - T,), starts.dtype)]
        )
        lens = jnp.concatenate([lens, jnp.zeros((Tp - T,), lens.dtype)])
    # Mosaic DMA slices must be 8-row aligned: pad the 7 gathered
    # rows to 8 with zero rows the kernel never reads (the zero rows
    # cost DMA bandwidth, not gather time — bandwidth is not the
    # bottleneck, the ~2.3 ns/element gather is).
    if n_rows < 8:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((8 - n_rows, pairs.shape[1]), pairs.dtype)],
            axis=0,
        )
    pad = jnp.zeros((8, SEG_WIN + _LANES), pairs.dtype)
    pad = pad.at[3, :].set(-_BIG)
    pairs_pad = jnp.concatenate([pairs, pad], axis=1)

    buf_w = SEG_WIN + _LANES + _UNROLL
    kernel = make_pairs_kernel(
        SEG_WIN, Tp, deep=deep, group=group,
        fused=(cfg.tile_w, cfg.tile_h, cfg.tiles_x),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tp // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (group, n_out, 8, _LANES),
                lambda i, s, l, c: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, 4), lambda i, s, l, c: (i, 0),
                memory_space=pltpu.SMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((2, 8, buf_w), jnp.float32),
            pltpu.SMEM((8, buf_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, metrics = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, n_out, 8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Tp, 4), jnp.int32),
        ),
        interpret=interpret,
    )(starts, lens, cam, pairs_pad)
    return out[:T], metrics[:T].reshape(T, 1, 4)


@partial(jax.jit, static_argnames=("cfg", "interpret", "shade_only"))
def trace_pairs_fused_subset(
    cam: Array,  # [16] f32 camera pack (`camera_vector`)
    pairs: Array,  # [7|8(+pad), cfg.pair_cap]
    starts: Array,  # [T] int32 — FULL frame segment table
    lens: Array,  # [T] int32
    tile_ids: Array,  # [K] int32 frame tile ids to render
    cfg: RenderConfig,
    interpret: bool = False,
    shade_only: bool = False,
):
    """Fused raygen+trace+shade for an arbitrary SUBSET of the frame's
    tiles (the TPU-native frameless mode: refresh whole 1024-ray tiles
    the way the reference refreshes 8-ray packets). Grid position k
    renders frame tile `tile_ids[k]` via an indirection read in the
    kernel; starts/lens stay the full-frame tables. Returns
    (out [K, C, 8, 128], metrics [K, 1, 4]) with the same rows as
    `trace_pairs_fused_soa` — or, with `shade_only`, exactly 7 rows
    (min_t, pos3, nrm3): the code accumulators leave the hot loop (1-2
    vector selects per candidate) for callers that never read codes."""
    K = tile_ids.shape[0]
    deep = cfg.max_depth >= 7
    n_out = 7 if shade_only else (9 if deep else 8)
    n_rows = 8 if deep else 7  # fat-rows payload (see bin_nodes)
    group = 8
    Kp = -(-K // group) * group
    sg = jax.lax.stop_gradient
    cam, pairs = sg((cam, pairs))
    if Kp != K:
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((Kp - K,), tile_ids.dtype)]
        )
    if n_rows < 8:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((8 - n_rows, pairs.shape[1]), pairs.dtype)],
            axis=0,
        )
    pad = jnp.zeros((8, SEG_WIN + _LANES), pairs.dtype)
    pad = pad.at[3, :].set(-_BIG)
    pairs_pad = jnp.concatenate([pairs, pad], axis=1)

    buf_w = SEG_WIN + _LANES + _UNROLL
    kernel = make_pairs_kernel(
        SEG_WIN, Kp, deep=deep, group=group,
        fused=(cfg.tile_w, cfg.tile_h, cfg.tiles_x),
        indirect=True, shade_only=shade_only,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Kp // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (group, n_out, 8, _LANES),
                lambda i, s, l, c, t: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, 4), lambda i, s, l, c, t: (i, 0),
                memory_space=pltpu.SMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.SMEM((2, 8, buf_w), jnp.float32),
            pltpu.SMEM((8, buf_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, metrics = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Kp, n_out, 8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((Kp, 4), jnp.int32),
        ),
        interpret=interpret,
    )(starts, lens, cam, tile_ids, pairs_pad)
    return out[:K], metrics[:K].reshape(K, 1, 4)


def binned_pairs(
    scene, cfg: RenderConfig, root: Array, templates: Array, frame=None
):
    """Global expansion + binning: (pairs, starts, lens, (n_pairs,
    overflow)) — overflow counts pair-table AND deep-level compaction
    drops.

    `frame` = (frame_w, frame_h, x_off, y_off) when cfg describes one
    device's block of a larger sharded frame (see `bin_nodes`)."""
    from sphereflake_tpu.camera import corner_rays, tile_frustum_planes

    frame_w, frame_h, x_off, y_off = (
        frame if frame is not None else (cfg.width, cfg.height, 0.0, 0.0)
    )
    block_planes = tile_frustum_planes(
        scene.camera, frame_w, frame_h,
        cfg.padded_height, cfg.padded_width,
        x_off=x_off, y_off=y_off,
        block_h=cfg.padded_height, block_w=cfg.padded_width,
    )[0]  # one "tile" = this device's whole block
    nodes, exp_overflow = expand_global(
        root, templates, scene.fractal, cfg, block_planes
    )
    minv = corner_basis(scene.camera, frame_w, frame_h)
    # This block's corner-ray directions (padded extent included: the
    # padded rows/cols extrapolate the corner interpolation, so the
    # hull must cover them for the behind-camera cull to be exact).
    origin, tl, tr, bl = corner_rays(scene.camera, frame_w / frame_h)
    ex, ey = tr - tl, bl - tl
    u0 = jnp.asarray(x_off, jnp.float32) / frame_w
    u1 = (jnp.asarray(x_off, jnp.float32) + cfg.padded_width) / frame_w
    v0 = jnp.asarray(y_off, jnp.float32) / frame_h
    v1 = (jnp.asarray(y_off, jnp.float32) + cfg.padded_height) / frame_h
    base = tl - origin
    corners = jnp.stack(
        [base + u * ex + v * ey for u in (u0, u1) for v in (v0, v1)]
    )
    pairs, starts, lens, (n_pairs, pair_ovf) = bin_nodes(
        nodes, minv, cfg, frame=frame, corners=corners
    )
    return pairs, starts, lens, (n_pairs, pair_ovf + exp_overflow)


def camera_vector(scene, cfg: RenderConfig, frame=None):
    """The 16-scalar camera pack consumed by the fused kernel's
    in-kernel raygen: [tl(3), ex(3), ey(3), origin(3), x_off, y_off,
    frame_w, frame_h] (`Sphereflake.cpp:162-167` corner
    parameterization)."""
    from sphereflake_tpu.camera import corner_rays

    frame_w, frame_h, x_off, y_off = (
        frame if frame is not None else (cfg.width, cfg.height, 0.0, 0.0)
    )
    origin, tl, tr, bl = corner_rays(scene.camera, frame_w / frame_h)
    ex, ey = tr - tl, bl - tl
    tail = jnp.stack(
        [
            jnp.asarray(x_off, jnp.float32),
            jnp.asarray(y_off, jnp.float32),
            jnp.float32(frame_w),
            jnp.float32(frame_h),
        ]
    )
    return jnp.concatenate([tl, ex, ey, origin, tail])


def _gbuffer_primal(statics, scene, offs):
    cfg, frame_w, frame_h, interpret = statics
    from sphereflake_tpu.models.sphereflake import child_templates, root_frame

    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)
    frame = (frame_w, frame_h, offs[0], offs[1])
    pairs, starts, lens, (_n, povf) = binned_pairs(
        scene, cfg, root, templates, frame=frame
    )
    cam = camera_vector(scene, cfg, frame=frame)
    out, m = trace_pairs_fused_soa(
        cam, pairs, starts, lens, cfg, interpret=interpret
    )
    deep = cfg.max_depth >= 7
    flat = lambda r: out[:, r].reshape(-1)
    min_t = flat(0)
    lo = flat(1)
    hi = flat(2) if deep else jnp.zeros_like(lo)
    px, py, pz = flat(-6), flat(-5), flat(-4)
    nx, ny, nz = flat(-3), flat(-2), flat(-1)
    hit = ((lo >= 1.0) | (hi >= 1.0)).astype(jnp.float32)
    # All-float outputs so the custom-JVP tangent structure is uniform
    # (the non-differentiable ones get zero tangents; counts stay exact
    # in f32 — they are < 2^24).
    return (min_t, px, py, pz, nx, ny, nz, hit, lo, hi,
            m.astype(jnp.float32), povf.astype(jnp.float32))


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def binned_gbuffer(statics, scene, offs):
    """The production forward pass: ONE fused Pallas dispatch computes
    raygen + binned ray tests + G-buffer shading; the XLA side only
    bins nodes and reshapes tiles to images. No `resolve_codes` re-walk
    and no dirs/shade arrays exist in the forward program.

    Differentiability is preserved by a custom JVP whose tangent
    re-derives (min_t, position, normal) from the saved path codes via
    `resolve_codes_soa` + the shading math, and differentiates that
    recomputation — the same straight-through-selection gradient the
    resolve-based forward produced (SURVEY §7 stage 5). JAX transposes
    the (linear) JVP automatically, so reverse mode (fitting) works.

    statics = (cfg, frame_w, frame_h, interpret); offs = (x_off, y_off)
    pixel offsets of this block within the frame.
    Returns flat [T*1024] arrays (min_t, px, py, pz, nx, ny, nz,
    hit(f32 0/1), code_lo, code_hi, metrics(f32 [T,1,4]),
    pair_overflow(f32)); min_t/pos/nrm carry derivatives.
    """
    return _gbuffer_primal(statics, scene, offs)


@binned_gbuffer.defjvp
def _gbuffer_jvp(statics, primals, tangents):
    cfg, frame_w, frame_h, _interpret = statics
    scene, offs = primals
    d_scene, _d_offs = tangents
    outs = _gbuffer_primal(statics, scene, offs)
    lo, hi = outs[8], outs[9]
    from sphereflake_tpu.models.sphereflake import child_templates, root_frame
    from sphereflake_tpu.ops.intersect import safe_sqrt
    from sphereflake_tpu.ops.pallas_traversal import resolve_codes_soa

    def h(scene):
        # Differentiable raygen for this block (same math the kernel
        # runs in f32 scalars), tiled to the kernel's flat ray order.
        from sphereflake_tpu.camera import corner_rays
        from sphereflake_tpu.render import _tile

        origin, tl, tr, bl = corner_rays(scene.camera, frame_w / frame_h)
        ex, ey = tr - tl, bl - tl
        u = (jnp.arange(cfg.padded_width, dtype=jnp.float32)[None, :]
             + offs[0]) / frame_w
        v = (jnp.arange(cfg.padded_height, dtype=jnp.float32)[:, None]
             + offs[1]) / frame_h
        comps = [(tl[a] + (ex[a] * u + ey[a] * v)) - origin[a]
                 for a in range(3)]
        dnorm = jnp.sqrt(comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2)
        dx, dy, dz = (_tile(c / dnorm, cfg).reshape(-1) for c in comps)
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        min_t, cx, cy, cz, hit = resolve_codes_soa(
            dx, dy, dz, lo, root, templates, scene.fractal, cfg,
            code_hi_f=hi if cfg.max_depth >= 7 else None,
        )
        t0 = jnp.where(hit, min_t, 0.0)
        px, py, pz = dx * t0, dy * t0, dz * t0
        wx, wy, wz = px - cx, py - cy, pz - cz
        nn = safe_sqrt(wx * wx + wy * wy + wz * wz)
        nn = jnp.where(nn > 0, nn, 1.0)
        hf = hit.astype(jnp.float32)
        return (min_t, px, py, pz,
                hf * (wx / nn), hf * (wy / nn), hf * (wz / nn))

    _, d7 = jax.jvp(h, (scene,), (d_scene,))
    zeros = tuple(jnp.zeros_like(o) for o in outs[7:])
    return outs, d7 + zeros
