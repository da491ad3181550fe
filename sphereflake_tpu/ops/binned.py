"""Binned traversal: frame-global expansion + screen-tile binning (XLA)
feeding a lean per-tile Pallas ray kernel.

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
   the corner-ray basis (`Sphereflake.cpp:162-167` inverted); (node,
   tile) pairs are laid out by a single sort, giving each tile a dense
   queue segment. The binning is a conservative superset of the
   per-tile frustum cull, so results match the per-tile kernel.
3. **Ray kernel** (`trace_pairs_pallas`): grid over tiles; per-tile
   segment (start, len) arrives via scalar prefetch; the kernel DMAs
   its pair window HBM->SMEM and runs the same scalar-driven
   node loop as the per-tile kernel — exactly `len` iterations, one
   [8, 128] vreg of rays.

Select with ``RenderConfig(algorithm="binned")``.
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

PAIR_CAP = 1 << 18  # upper bound on cfg.pair_cap (18-bit fill packing)
SEG_WIN = 512  # pairs per kernel DMA window (segments of ANY length
# are consumed by looping windows — SEG_WIN is a staging-buffer size,
# not a correctness cap)
_UNROLL = 8  # independent node chains per loop iteration (VPU ILP)
_LANES = 128


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


def _running_max_1d(x: Array) -> Array:
    """Inclusive running max over a 1D int32 array (see
    `_running_max_rows`)."""
    return _running_max_rows(x[None, :])[0]


_POW7 = 9**7  # path-code hi/lo split: lo < 9^7 stays f32-exact
DEEP_MAX_DEPTH = 14  # hi < 9^7 bound on the two-lane code


def _expand_cap(cfg: RenderConfig) -> int:
    """Pre-expansion live cap: once a level's children would exceed
    global_cap, the parents are compacted this hard first. global_cap
    defaults to exactly 9x this, so compacted parents' children fill
    the emitted level with NO second (emit-time) compaction sort."""
    return max(4096, cfg.global_cap // 9)


def _level_sizes(cfg: RenderConfig) -> list[int]:
    """Static emitted node count per level: dense 9^l while that fits
    cfg.global_cap, then compacted to the cap's closest live nodes."""
    sizes, n = [], 1
    for _ in range(cfg.max_depth + 1):
        sizes.append(min(n, cfg.global_cap))
        n = 9 * (min(sizes[-1], _expand_cap(cfg))
                 if 9 * sizes[-1] > cfg.global_cap else sizes[-1])
    return sizes


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
    approach dive to level 14 expands only the live frontier, never
    the 9^14 dense tree.

    Path codes ride two lanes (code = hi * 9^7 + lo) so depths past 7
    stay exact in f32 kernel rows (`DEEP_MAX_DEPTH` = 14).

    Returns (nodes dict with [N] component arrays over all levels
    concatenated — cx, cy, cz, cc, r2, lodr, code (lo, int32),
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

    out = {k: [] for k in ("cx", "cy", "cz", "cc", "r2", "lodr", "code",
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
        out["lodr"].append(jnp.full((n,), 1.0, jnp.float32) * (lod_sq * radius))
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


def bin_nodes(nodes, minv, cfg: RenderConfig, frame=None):
    """Conservative (node, tile) pairing + one sort into tile segments.

    `frame` = (frame_w, frame_h, x_off, y_off) describes the full image
    this cfg's block is cut from (sharded rendering: each device bins
    into its own block's tiles, offset by (x_off, y_off) pixels within
    the frame whose corner-ray basis `minv` was built from). Defaults
    to the unsharded identity (cfg.width, cfg.height, 0, 0).

    Returns (pairs [8, cfg.pair_cap], starts [T], lens [T], n_pairs,
    pair_overflow)."""
    pair_cap = cfg.pair_cap
    tw, th = cfg.tile_w, cfg.tile_h
    tx_n, ty_n = cfg.tiles_x, cfg.tiles_y
    n_tiles = tx_n * ty_n
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
    counts = jnp.where(nodes["live"], bw * (ty1 - ty0 + 1), 0)

    offsets = jnp.cumsum(counts)  # inclusive
    n_pairs = offsets[-1]
    pair_overflow = jnp.maximum(n_pairs - pair_cap, 0)

    # pair -> (node, tile), GATHER-FREE: random-index gathers over the
    # pair array cost ~20 ns/element on TPU and dominated the round-2
    # frame (31 of 53 ms — docs/PERF.md). Instead, scatter each live
    # node's attributes at its FIRST pair slot and fill the gaps with
    # running maxima: `first` is strictly increasing over live nodes,
    # so packing attr into the low bits of (first << k | attr) makes
    # each fill a monotone max-scan — 4 scans + 4 scatters, all
    # bandwidth-bound, replace 6 gathers.
    first = offsets - counts
    # Live nodes have strictly increasing `first`, so in-bounds slots
    # are UNIQUE — scatter with mode="drop" + unique_indices (dead
    # nodes aim at PAIR_CAP, out of bounds) instead of a dup-tolerant
    # .at[].max, and all four fill sources ride ONE batched scatter.
    slot = jnp.where(
        (counts > 0) & (first < pair_cap), first, pair_cap
    )
    iota_p = jnp.arange(pair_cap, dtype=jnp.int32)

    # Bit budget: first < PAIR_CAP (2^18) needs 18 bits; tile coords
    # and widths fit the remaining 13 even at 16384^2 (tiles_x 512 ->
    # 9 bits), one attribute per scan.
    fbits = max(1, (PAIR_CAP - 1).bit_length())  # fixed: first < 2^18
    abits = 31 - fbits
    assert tx_n <= (1 << abits) and ty_n <= (1 << abits), (
        f"tile grid {tx_n}x{ty_n} exceeds the {abits}-bit pack budget"
    )
    sources = jnp.stack(
        [
            jnp.arange(counts.shape[0], dtype=jnp.int32),  # node id
            (first << abits) | tx0,
            (first << abits) | ty0,
            (first << abits) | bw,
        ]
    )
    marks = (
        jnp.full((4, pair_cap), -1, jnp.int32)
        .at[:, slot]
        .set(sources, mode="drop", unique_indices=True)
    )
    pair_node, pk_x0, pk_y0, pk_bw = _running_max_rows(marks)
    amask = (1 << abits) - 1
    p_first = pk_x0 >> abits
    pair_rank = iota_p - p_first
    pair_valid = iota_p < n_pairs  # offsets are gapless
    nb_w = jnp.maximum(pk_bw & amask, 1)
    p_tx = (pk_x0 & amask) + pair_rank % nb_w
    p_ty = (pk_y0 & amask) + pair_rank // nb_w
    tile = jnp.where(pair_valid, p_ty * tx_n + p_tx, n_tiles)

    # One variadic sort carries the node id with its key — the
    # argsort-then-gather form costs two extra 262k gathers (~3.5 ms
    # each on TPU) for the same result.
    tile_sorted, node_sorted = jax.lax.sort(
        (tile, pair_node), num_keys=1
    )

    # Kernel row layout: rc = r^2 - |c|^2 and rc4 = 4r^2 - |c|^2 fold
    # the self/bounding discriminants into one FMA each in the kernel
    # (disc = tca^2 + rc >= 0 <=> d2 <= r^2).
    rows = jnp.stack(
        [
            nodes["cx"], nodes["cy"], nodes["cz"],
            nodes["r2"] - nodes["cc"],
            4.0 * nodes["r2"] - nodes["cc"],
            nodes["lodr"],
            nodes["code"].astype(jnp.float32),
            nodes["code_hi"].astype(jnp.float32),
        ]
    )  # [8, N]
    pairs = rows[:, node_sorted]  # [8, PAIR_CAP]
    # Dead pairs (tile == n_tiles) sit at the end; starts/lens ignore
    # them, but stamp rc = rc4 = -BIG defensively so no ray test (nor
    # an unrolled-tail or window-overshoot read) can ever pass.
    dead = tile_sorted >= n_tiles
    pairs = pairs.at[3, :].set(jnp.where(dead, -_BIG, pairs[3, :]))
    pairs = pairs.at[4, :].set(jnp.where(dead, -_BIG, pairs[4, :]))

    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    )
    starts, lens = bounds[:-1], bounds[1:] - bounds[:-1]
    return pairs, starts.astype(jnp.int32), lens.astype(jnp.int32), (
        n_pairs, pair_overflow
    )


def make_pairs_kernel(win: int, n_tiles: int, deep: bool = False,
                      group: int = 8):
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
    - **ILP via 4 independent node chains.** Each loop iteration tests
      `_UNROLL` nodes against the ray vreg into separate (t, code)
      accumulators, merged after the loop — the serial min-select
      dependence of the round-2 kernel left the VPU idle between
      nodes. Per-node math is 2 FMAs + compares thanks to the
      precomputed rc/rc4 rows (`bin_nodes`).
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
    """
    assert n_tiles % group == 0
    stride = 6 if deep else 5
    buf_w = win + _LANES + _UNROLL  # aligned window + unroll overshoot

    def kernel(
        starts_ref,  # SMEM [T] scalar-prefetch
        lens_ref,  # SMEM [T] scalar-prefetch
        dirs_ref,  # VMEM [group, 3, 8, 128]
        pairs_ref,  # ANY (HBM) [8, PAIR_CAP + win + 128]
        out_ref,  # VMEM [group, 5|6, 8, 128]: t, lo[, hi], cx, cy, cz
        mout_ref,  # SMEM [group, 4]
        qf,  # SMEM scratch [2, 8, buf_w] first-window double buffer
        qr,  # SMEM scratch [8, buf_w] windows >= 1
        sem_f,  # DMA semaphores [2]
        sem_r,  # DMA semaphore
    ):
        i = pl.program_id(0)
        big = jnp.full((8, _LANES), _BIG, jnp.float32)
        zero = jnp.zeros((8, _LANES), jnp.float32)

        def first_dma(tile_idx, dst_slot):
            st = starts_ref[tile_idx]
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

            start = starts_ref[tile]
            length = lens_ref[tile]
            dx = dirs_ref[g, 0]
            dy = dirs_ref[g, 1]
            dz = dirs_ref[g, 2]
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
                        rc = load(3, idx)
                        rc4 = load(4, idx)
                        lodr = load(5, idx)
                        code = load(6, idx)
                        tca = dx * cx + dy * cy + dz * cz
                        t2 = tca * tca
                        disc = t2 + rc  # r^2 - d^2
                        c1 = tca - lodr
                        # `SIMD_AVX.h:236-270` + the sqrt-free LOD gate.
                        lod_ok = (c1 < 0.0) | (c1 * c1 < t2 + rc4)
                        ok = (
                            (tca >= 0.0) & lod_ok & (disc >= 0.0) & (k < cnt)
                        )
                        ts = tca - jnp.sqrt(jnp.maximum(disc, 0.0))
                        a = stride * u
                        bt = acc[a]
                        better = ok & (ts < bt)
                        sel = lambda new, old: jnp.where(better, new, old)
                        acc[a] = sel(ts, bt)
                        acc[a + 1] = sel(code, acc[a + 1])
                        if deep:
                            acc[a + 2] = sel(load(7, idx), acc[a + 2])
                        b = a + stride - 3
                        acc[b] = sel(cx, acc[b])
                        acc[b + 1] = sel(cy, acc[b + 1])
                        acc[b + 2] = sel(cz, acc[b + 2])
                    return tuple(acc)

                nq = (cnt + _UNROLL - 1) // _UNROLL
                return jax.lax.fori_loop(0, nq, node_quad, acc, unroll=False)

            acc0 = (
                (big,) + (zero,) * (stride - 1)
            ) * _UNROLL
            acc = window(0, acc0, from_first=True)

            def rest_body(w, acc, start=start):
                wstart = start + w * win
                base = pl.multiple_of((wstart // _LANES) * _LANES, _LANES)
                cp = pltpu.make_async_copy(
                    pairs_ref.at[:, pl.ds(base, win + _LANES)],
                    qr.at[:, : win + _LANES],
                    sem_r,
                )
                cp.start()
                cp.wait()
                return window(w, acc, from_first=False)

            acc = jax.lax.fori_loop(1, n_win, rest_body, acc, unroll=False)

            best = list(acc[:stride])
            for u in range(1, _UNROLL):
                take = acc[stride * u] < best[0]
                for c in range(stride):
                    best[c] = jnp.where(take, acc[stride * u + c], best[c])
            for c in range(stride):
                out_ref[g, c] = best[c]
            mout_ref[g, 0] = length
            mout_ref[g, 1] = jnp.int32(0)  # windowed: nothing can drop
            mout_ref[g, 2] = jnp.int32(0)
            mout_ref[g, 3] = jnp.int32(0)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_pairs_pallas(
    tile_dirs: Array,  # [T, 1024, 3]
    pairs: Array,  # [8, PAIR_CAP]
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
    deep = cfg.max_depth > 7
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
    pairs: Array,  # [8, PAIR_CAP]
    starts: Array,  # [T] int32
    lens: Array,  # [T] int32
    cfg: RenderConfig,
    interpret: bool = False,
):
    """SoA core: returns (out [T, C, 8, 128], metrics [T, 1, 4]) with
    rows (t, code_lo[, code_hi], cx, cy, cz): C = 6 when
    cfg.max_depth > 7, else 5."""
    T = dirs_k.shape[0]
    deep = cfg.max_depth > 7
    n_out = 6 if deep else 5
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
    # carries rc = rc4 = -BIG so no test can pass on it.
    pad = jnp.zeros((8, SEG_WIN + _LANES), pairs.dtype)
    pad = pad.at[3:5, :].set(-_BIG)
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
            pl.BlockSpec(memory_space=pltpu.ANY),
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


def binned_pairs(
    scene, cfg: RenderConfig, root: Array, templates: Array, frame=None
):
    """Global expansion + binning: (pairs, starts, lens, (n_pairs,
    overflow)) — overflow counts pair-table AND deep-level compaction
    drops.

    `frame` = (frame_w, frame_h, x_off, y_off) when cfg describes one
    device's block of a larger sharded frame (see `bin_nodes`)."""
    from sphereflake_tpu.camera import tile_frustum_planes

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
    pairs, starts, lens, (n_pairs, pair_ovf) = bin_nodes(
        nodes, minv, cfg, frame=frame
    )
    return pairs, starts, lens, (n_pairs, pair_ovf + exp_overflow)


def trace_tiles_binned(
    tiles: Array,  # [T, 1024, 3]
    scene,
    cfg: RenderConfig,
    root: Array,  # unused (binned_trace re-derives); kept for dispatch parity
    templates: Array,  # unused likewise
    frame=None,  # (frame_w, frame_h, x_off, y_off) for sharded blocks
):
    """Full binned pipeline -> TraceResult-compatible tuple, AoS entry
    (the sharded block path). Runs the same resolve-free forward +
    custom-VJP backward as the SoA pipeline (`binned_trace`)."""
    from sphereflake_tpu.ops.pallas_traversal import depth_reached_soa

    T, rays, _ = tiles.shape
    frame_w, frame_h, x_off, y_off = (
        frame if frame is not None else (cfg.width, cfg.height, 0.0, 0.0)
    )
    dirs_k = jnp.moveaxis(tiles, 2, 1).reshape(T, 3, 8, _LANES)
    interpret = jax.default_backend() != "tpu"
    min_t, cx, cy, cz, hit_f, lo, hi, m, povf = binned_trace(
        (cfg, frame_w, frame_h, interpret),
        scene, dirs_k,
        (jnp.asarray(x_off, jnp.float32), jnp.asarray(y_off, jnp.float32)),
    )
    center = jnp.stack([cx, cy, cz], axis=-1).reshape(T, rays, 3)
    overflow = (jnp.sum(m[:, 0, 1]) + povf).astype(jnp.int32)
    depth_reached = depth_reached_soa(lo, cfg, hi)
    return (
        min_t.reshape(T, rays), center, (hit_f != 0.0).reshape(T, rays),
        depth_reached, jnp.sum(m[:, 0, 0]).astype(jnp.int32), overflow,
    )


def _trace_primal(statics, scene, dirs_k, offs):
    cfg, frame_w, frame_h, interpret = statics
    from sphereflake_tpu.models.sphereflake import child_templates, root_frame

    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)
    pairs, starts, lens, (_n, povf) = binned_pairs(
        scene, cfg, root, templates,
        frame=(frame_w, frame_h, offs[0], offs[1]),
    )
    out, m = trace_pairs_pallas_soa(
        dirs_k, pairs, starts, lens, cfg, interpret=interpret
    )
    deep = cfg.max_depth > 7
    t = out[:, 0].reshape(-1)
    lo = out[:, 1].reshape(-1)
    hi = out[:, 2].reshape(-1) if deep else jnp.zeros_like(lo)
    cx = out[:, -3].reshape(-1)
    cy = out[:, -2].reshape(-1)
    cz = out[:, -1].reshape(-1)
    hit = ((lo >= 1.0) | (hi >= 1.0)).astype(jnp.float32)
    min_t = jnp.where(hit > 0.0, t, _BIG)
    # All-float outputs so the custom-JVP tangent structure is uniform
    # (the non-differentiable ones get zero tangents; counts stay exact
    # in f32 — they are < 2^24).
    return (min_t, cx, cy, cz, hit, lo, hi,
            m.astype(jnp.float32), povf.astype(jnp.float32))


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def binned_trace(statics, scene, dirs_k, offs):
    """Forward binned trace WITHOUT the resolve re-walk: the kernel
    already computed the winner's t and center, so the primal reads
    them straight out of the kernel rows (saving the ~2 ms
    `resolve_codes` pass per frame). Differentiability is preserved by
    a custom JVP whose tangent re-derives (min_t, center) from the
    saved path codes via `resolve_codes_soa` and differentiates that
    recomputation — the same straight-through-selection gradient the
    resolve-based forward produced. JAX transposes the (linear) JVP
    automatically, so reverse mode (fitting) works too (SURVEY §7
    stage 5, recompute-based backward).

    statics = (cfg, frame_w, frame_h, interpret); offs = (x_off, y_off)
    traced pixel offsets of this block within the frame.
    Returns (min_t, cx, cy, cz, hit(f32 0/1), code_lo, code_hi,
    metrics(f32), pair_overflow(f32)); only the first four carry
    nonzero derivatives.
    """
    return _trace_primal(statics, scene, dirs_k, offs)


@binned_trace.defjvp
def _trace_jvp(statics, primals, tangents):
    cfg = statics[0]
    scene, dirs_k, offs = primals
    d_scene, d_dirs, _d_offs = tangents
    outs = _trace_primal(statics, scene, dirs_k, offs)
    lo, hi = outs[5], outs[6]
    from sphereflake_tpu.models.sphereflake import child_templates, root_frame
    from sphereflake_tpu.ops.pallas_traversal import resolve_codes_soa

    def h(scene, dirs_k):
        dx = dirs_k[:, 0].reshape(-1)
        dy = dirs_k[:, 1].reshape(-1)
        dz = dirs_k[:, 2].reshape(-1)
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        min_t, cx, cy, cz, _ = resolve_codes_soa(
            dx, dy, dz, lo, root, templates, scene.fractal, cfg,
            code_hi_f=hi if cfg.max_depth > 7 else None,
        )
        return min_t, cx, cy, cz

    _, (dt, dcx, dcy, dcz) = jax.jvp(h, (scene, dirs_k), (d_scene, d_dirs))
    zeros = tuple(jnp.zeros_like(o) for o in outs[4:])
    return outs, (dt, dcx, dcy, dcz) + zeros
