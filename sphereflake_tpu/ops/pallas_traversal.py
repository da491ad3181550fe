"""Fused Pallas traversal kernel — the production TPU fast path.

One `pallas_call` renders the whole G-buffer: the grid walks screen
tiles; each grid step traverses the 9-ary sphereflake for its tile with
the frontier resident in VMEM. Semantics match `trace_tile_fast` (the
tile-as-packet reading of the reference's traversal,
`Sphereflake.h:86-226`): per-node bounding(2r) + LOD culls decide which
spheres are *candidates*; per-ray bounding/LOD/self tests decide hits.

TPU-native design (v2 — the round-2 rewrite):

- **Frustum culling, not cones.** Each tile's ray bundle is exactly the
  convex hull of its 4 corner rays (bilinear corner interpolation,
  `Sphereflake.cpp:162-167`), so 4 plane tests dilated by the bounding
  radius 2r give a tight, exactly conservative cull — the TPU analogue
  of the reference's per-packet movemask early-out
  (`Sphereflake.h:140-144`), hoisted from per-ray to per-node.
- **Candidate queue.** Per-ray work is decoupled from the levelwise
  expansion: every frustum-surviving node is appended to a queue
  (center, |c|^2, r^2, lod*r, path code); the queue is stream-compacted
  ONCE; rays then test it in 128-lane chunks. Per-ray cost is the
  actual candidate count (typically a few hundred) instead of
  128 x (depth+1) lanes of padding.
- **Frontier as a row-SoA [16, C] panel** (9 rotation rows, 3
  translation rows, path code, valid flag, constant-one, spare). A
  child expansion is one [16, 16] @ [16, C] matmul per template — the
  whole affine compose + code bookkeeping as a single MXU op (the
  reference does a 4x4 SSE multiply per visited node,
  `SIMD_AVX.h:59-81`). Per-level static caps keep coarse levels tiny.
- **Log-shift stream compaction** packs surviving lanes left in
  O(log N) vector rolls — no gathers, no sorts, all VPU.
- **Path codes are the only hit payload.** The winner's base-9 tree
  path (sentinel-prefixed: root=1, child: code*9+j, so the level is
  floor(log9 code)) is emitted per ray. `resolve_codes` re-derives the
  winning sphere's frame and the analytic hit distance differentiably
  in XLA — straight-through selection (SURVEY §7 stage 5), which is
  what makes `jax.grad` flow through this production path with no
  backward kernel.

Path codes ride an f32 lane, so `max_depth <= 7` here (2*9^7 < 2^24
stays exact); deeper renders use the XLA paths.
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

# Frontier panel rows.
_R00, _R01, _R02, _R10, _R11, _R12, _R20, _R21, _R22 = range(9)
_TX, _TY, _TZ = 9, 10, 11
_CODE, _VALID, _ONE, _SPARE = 12, 13, 14, 15
_ROWS = 16

# Queue rows.
_QX, _QY, _QZ, _QCC, _QR2, _QLODR, _QCODE, _QSPARE = range(8)
_QROWS = 8

_LANES = 128  # VPU lane width; queue chunk size for per-ray tests.

PALLAS_MAX_DEPTH = 7  # f32 path-code exactness bound (2*9^7 < 2^24)


def _ru128(n: int) -> int:
    return ((n + 127) // 128) * 128


def level_caps(cfg: RenderConfig) -> list[int]:
    """Static frontier capacity per level, each a multiple of 128."""
    cap = max(128, (cfg.max_frontier // 128) * 128)
    return [
        min(_ru128(9**level), cap) for level in range(cfg.max_depth + 1)
    ]


def _expansion_matrices(templates: Array, scales: Array) -> Array:
    """[D, 9, 16, 16] per-(level, child) frontier-panel update matrices.

    child_panel = M[level, j] @ parent_panel implements
    `worldTransform = parentTransform * childTransform`
    (`Sphereflake.h:165-169`) on the row-SoA panel, plus path-code
    propagation (code' = 9*code + j). templates: [9, 3, 4] unit child
    frames; scales: [D] tangent distances (1 + ratio) * radius_level
    (`Sphereflake.h:162-168`).
    """
    D = scales.shape[0]
    rot = templates[:, :, :3]  # [9, 3, 3]
    disp = templates[:, :, 3]  # [9, 3]
    m = jnp.zeros((D, 9, _ROWS, _ROWS), jnp.float32)
    # Rotation rows: child_R[a, b] = sum_k parent_R[a, k] * rot[j][k, b].
    for a in range(3):
        for b in range(3):
            for k in range(3):
                m = m.at[:, :, 3 * a + b, 3 * a + k].set(
                    jnp.broadcast_to(rot[:, k, b], (D, 9))
                )
    # Translation rows: child_t[a] = sum_k parent_R[a, k] * (scale *
    # disp[j][k]) + parent_t[a].
    for a in range(3):
        for k in range(3):
            m = m.at[:, :, _TX + a, 3 * a + k].set(
                scales[:, None] * disp[None, :, k]
            )
        m = m.at[:, :, _TX + a, _TX + a].set(1.0)
    # code' = 9 * code + j (base-9 path digit); valid and one copy through.
    j_idx = jnp.arange(9, dtype=jnp.float32)
    m = m.at[:, :, _CODE, _CODE].set(9.0)
    m = m.at[:, :, _CODE, _ONE].set(jnp.broadcast_to(j_idx, (D, 9)))
    m = m.at[:, :, _VALID, _VALID].set(1.0)
    m = m.at[:, :, _ONE, _ONE].set(1.0)
    return m


def _initial_panel(root: Array, cap: int) -> Array:
    """[16, cap] frontier panel holding the root frame in slot 0.

    The root path code is the sentinel 1 (so level = floor(log9 code))."""
    panel = jnp.zeros((_ROWS, cap), jnp.float32)
    rot = root[:, :3].reshape(9)
    panel = panel.at[:9, 0].set(rot)
    panel = panel.at[_TX:_TZ + 1, 0].set(root[:, 3])
    panel = panel.at[_CODE, 0].set(1.0)
    panel = panel.at[_VALID, 0].set(1.0)
    panel = panel.at[_ONE, :].set(1.0)  # constant row feeds code digits
    return panel


def _roll_left(x, sh: int):
    """np.roll(x, -sh) along the last (lane) axis."""
    n = x.shape[-1]
    return pltpu.roll(x, (n - sh) % n, axis=x.ndim - 1)


def _cumsum_lanes(x, n: int):
    """Inclusive cumsum along lanes of [1, n] int32 via log-shift adds."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    sh = 1
    while sh < n:
        shifted = pltpu.roll(x, sh, axis=1)  # roll right
        x = x + jnp.where(lane >= sh, shifted, 0)
        sh *= 2
    return x


def _num_steps(n: int) -> int:
    steps = 0
    while (1 << steps) < n:
        steps += 1
    return steps


def _compact_rows(data, keep, width: int, nrows: int):
    """Log-shift stream compaction: pack lanes where keep is true to the
    left of `data` [nrows, width]. Returns (packed, total kept [])."""
    keep_i = keep.astype(jnp.int32)
    pos = _cumsum_lanes(keep_i, width)  # inclusive
    total = pos[0, width - 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    mv = jnp.where(keep, lane - (pos - 1), 0)
    for k in range(_num_steps(width)):
        sh = 1 << k
        mv_s = _roll_left(mv, sh)
        take = ((mv_s >> k) & 1) != 0
        data = jnp.where(take, _roll_left(data, sh), data)
        mv = jnp.where(take, mv_s - sh, mv)
    return data, total


def make_trace_kernel(cfg: RenderConfig, rays: int):
    """Build the pallas kernel body for a tile of `rays` rays."""
    depth = cfg.max_depth
    caps = level_caps(cfg)
    offs = [0]
    for c in caps:
        offs.append(offs[-1] + c)
    qtot = offs[-1]
    n_chunks = qtot // _LANES

    def kernel(
        levels_ref,  # SMEM [4, depth+1]: radius, r^2, 4r^2, lod^2*r
        planes_ref,  # SMEM [1, 1, 12]: 4 inward unit frustum normals
        dirs_ref,  # VMEM [1, rays, 3]
        panel0_ref,  # VMEM [16, caps[0]] initial frontier
        expand_ref,  # VMEM [depth, 9, 16, 16] (dummy when depth == 0)
        out_ref,  # VMEM [1, rays, 8]: t, code, -, ...
        mout_ref,  # SMEM [1, 1, 8]: qlen, overflow, max_depth, live, ...
        panel,  # VMEM scratch [16, max(caps)]
        children,  # VMEM scratch [16, 9*max(caps)]
        queue,  # VMEM scratch [8, qtot]
        best,  # VMEM scratch [rays, 2]
        live_ref,  # SMEM scratch [4]
    ):
        dx = dirs_ref[0, :, 0:1]  # [rays, 1]
        dy = dirs_ref[0, :, 1:2]
        dz = dirs_ref[0, :, 2:3]

        panel[:, : caps[0]] = panel0_ref[:]
        best[:, 0:1] = jnp.full((rays, 1), _BIG, jnp.float32)
        best[:, 1:2] = jnp.zeros((rays, 1), jnp.float32)
        live_ref[0] = jnp.int32(1)
        live_ref[1] = jnp.int32(0)  # overflow
        live_ref[2] = jnp.int32(0)  # max depth reached

        # ---- phase 1: expansion + queue append (node-lane work) ----
        for level in range(depth + 1):
            cap = caps[level]
            off = offs[level]
            live = live_ref[0]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

            @pl.when(live > 0)
            def _():
                live_ref[2] = jnp.int32(level)

            # Append this level's live nodes to the queue segment
            # (invalid lanes carry r2 = -1 so every ray test fails).
            cx = panel[_TX:_TX + 1, :cap]
            cy = panel[_TY:_TY + 1, :cap]
            cz = panel[_TZ:_TZ + 1, :cap]
            okv = lane < live
            queue[_QX:_QX + 1, off:off + cap] = cx
            queue[_QY:_QY + 1, off:off + cap] = cy
            queue[_QZ:_QZ + 1, off:off + cap] = cz
            queue[_QCC:_QCC + 1, off:off + cap] = cx * cx + cy * cy + cz * cz
            queue[_QR2:_QR2 + 1, off:off + cap] = jnp.where(
                okv, levels_ref[1, level], -1.0
            )
            queue[_QLODR:_QLODR + 1, off:off + cap] = jnp.full(
                (1, cap), 1.0, jnp.float32
            ) * levels_ref[3, level]
            queue[_QCODE:_QCODE + 1, off:off + cap] = panel[
                _CODE:_CODE + 1, :cap
            ]
            queue[_QSPARE:_QSPARE + 1, off:off + cap] = jnp.zeros(
                (1, cap), jnp.float32
            )

            if level == depth:
                break

            # Expansion: compose children, frustum-cull, compact.
            cap_n = caps[level + 1]
            width = 9 * cap

            @pl.when(live > 0)
            def _():
                for j in range(9):
                    children[:, j * cap:(j + 1) * cap] = jax.lax.dot(
                        expand_ref[level, j],
                        panel[:, :cap],
                        precision=jax.lax.Precision.HIGHEST,
                    )

                r_c = levels_ref[0, level + 1]
                lod_rc = levels_ref[3, level + 1]
                ccx = children[_TX:_TX + 1, :width]  # [1, width]
                ccy = children[_TY:_TY + 1, :width]
                ccz = children[_TZ:_TZ + 1, :width]
                cc = ccx * ccx + ccy * ccy + ccz * ccz
                dist = jnp.sqrt(jnp.maximum(cc, 1e-20))
                # Conservative LOD: closest possible bounding-sphere hit
                # (dist - 2r) still below the cut (`Sphereflake.h:146`).
                keep = (dist - 2.0 * r_c) < lod_rc
                # Frustum: inward planes dilated by the bounding radius.
                neg2r = -2.0 * r_c
                for p in range(4):
                    d_p = (
                        planes_ref[0, 0, 3 * p] * ccx
                        + planes_ref[0, 0, 3 * p + 1] * ccy
                        + planes_ref[0, 0, 3 * p + 2] * ccz
                    )
                    keep = keep & (d_p >= neg2r)
                keep = keep & (children[_VALID:_VALID + 1, :width] > 0.0)

                # The last expansion's output is only ever self-tested,
                # so only translation + code rows need compacting.
                row_lo = _TX if level + 1 == depth else 0
                packed, total = _compact_rows(
                    children[row_lo:_CODE + 1, :width],
                    keep,
                    width,
                    _CODE + 1 - row_lo,
                )
                new_live = jnp.minimum(total, cap_n)
                lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, cap_n), 1)
                panel[row_lo:_CODE + 1, :cap_n] = packed[:, :cap_n]
                panel[_VALID:_VALID + 1, :cap_n] = jnp.where(
                    lane_n < new_live, 1.0, 0.0
                )
                panel[_ONE:_ONE + 1, :cap_n] = jnp.ones((1, cap_n), jnp.float32)
                live_ref[0] = new_live
                live_ref[1] += jnp.maximum(total - cap_n, 0)

        # ---- phase 1.5: compact the queue once ----
        keepq = queue[_QR2:_QR2 + 1, :] > 0.0
        packedq, qlen = _compact_rows(queue[:, :], keepq, qtot, _QROWS)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, qtot), 1)
        queue[:, :] = packedq
        queue[_QR2:_QR2 + 1, :] = jnp.where(
            lane_q < qlen, packedq[_QR2:_QR2 + 1, :], -1.0
        )
        live_ref[3] = qlen

        # ---- phase 2: per-ray tests, one 128-lane chunk at a time ----
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rays, _LANES), 1)
        for c in range(n_chunks):
            lo = c * _LANES

            @pl.when(qlen > lo)
            def _():
                cx = queue[_QX:_QX + 1, lo:lo + _LANES]  # [1, 128]
                cy = queue[_QY:_QY + 1, lo:lo + _LANES]
                cz = queue[_QZ:_QZ + 1, lo:lo + _LANES]
                cc = queue[_QCC:_QCC + 1, lo:lo + _LANES]
                r2 = queue[_QR2:_QR2 + 1, lo:lo + _LANES]
                lodr = queue[_QLODR:_QLODR + 1, lo:lo + _LANES]
                tca = dx * cx + dy * cy + dz * cz  # [rays, 128]
                d2 = cc - tca * tca
                tb = tca - jnp.sqrt(jnp.maximum(4.0 * r2 - d2, 0.0))
                ok = (
                    (tca >= 0.0)
                    & (tb < lodr)
                    & (d2 <= r2)
                )
                ts = tca - jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
                ts = jnp.where(ok, ts, _BIG)
                t_chunk = jnp.min(ts, axis=1, keepdims=True)  # [rays, 1]
                upd = t_chunk < best[:, 0:1]

                @pl.when(jnp.any(upd))
                def _():
                    idx = jnp.min(
                        jnp.where(ts <= t_chunk, lane_r, qtot),
                        axis=1,
                        keepdims=True,
                    )
                    oh = (lane_r == idx).astype(jnp.float32)
                    code_pick = jnp.sum(
                        oh * queue[_QCODE:_QCODE + 1, lo:lo + _LANES],
                        axis=1,
                        keepdims=True,
                    )
                    best[:, 0:1] = jnp.where(upd, t_chunk, best[:, 0:1])
                    best[:, 1:2] = jnp.where(upd, code_pick, best[:, 1:2])

        out_ref[0, :, 0:1] = best[:, 0:1]
        out_ref[0, :, 1:2] = best[:, 1:2]
        out_ref[0, :, 2:8] = jnp.zeros((rays, 6), jnp.float32)
        mout_ref[0, 0, 0] = live_ref[3]  # nodes ray-tested (queue length)
        mout_ref[0, 0, 1] = live_ref[1]  # overflow
        mout_ref[0, 0, 2] = live_ref[2]  # deepest level with live nodes
        mout_ref[0, 0, 3] = live_ref[0]  # final live count
        mout_ref[0, 0, 4] = jnp.int32(0)
        mout_ref[0, 0, 5] = jnp.int32(0)
        mout_ref[0, 0, 6] = jnp.int32(0)
        mout_ref[0, 0, 7] = jnp.int32(0)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_tiles_pallas(
    tile_dirs: Array,  # [T, R, 3] unit ray dirs per tile
    tile_planes: Array,  # [T, 4, 3] inward unit frustum plane normals
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
    interpret: bool = False,
):
    """Trace all tiles with the fused kernel.

    Returns (out [T, R, 8], metrics [T, 1, 8] int32). out columns:
    t (_BIG at miss), sentinel-prefixed base-9 path code (0 at miss).
    Non-differentiable by construction (inputs are stop-gradiented);
    gradients flow through `resolve_codes` instead.
    """
    assert cfg.max_depth <= PALLAS_MAX_DEPTH, (
        f"pallas path supports max_depth <= {PALLAS_MAX_DEPTH} "
        "(f32 path-code exactness); use an XLA algorithm for deeper"
    )
    sg = jax.lax.stop_gradient
    tile_dirs, tile_planes, root, templates, fractal = sg(
        (tile_dirs, tile_planes, root, templates, fractal)
    )
    T, rays, _ = tile_dirs.shape
    depth = cfg.max_depth
    caps = level_caps(cfg)
    capmax = max(caps)
    qtot = sum(caps)

    levels = jnp.arange(depth + 1, dtype=jnp.float32)
    radii = fractal.root_radius * fractal.radius_ratio ** levels
    lod_sq = jnp.float32(cfg.lod_factor**2)
    level_tab = jnp.stack(
        [radii, radii * radii, 4.0 * radii * radii, lod_sq * radii]
    )  # [4, depth+1]

    scales = (1.0 + fractal.radius_ratio) * radii[:-1] if depth > 0 else (
        jnp.zeros((0,), jnp.float32)
    )
    expand = (
        _expansion_matrices(templates, scales)
        if depth > 0
        else jnp.zeros((1, 9, _ROWS, _ROWS), jnp.float32)
    )
    panel0 = _initial_panel(root, caps[0])
    planes_flat = tile_planes.reshape(T, 1, 12)

    kernel = make_trace_kernel(cfg, rays)
    n_expand = max(depth, 1)

    out, metrics = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (4, depth + 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 12), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, rays, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROWS, caps[0]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_expand, 9, _ROWS, _ROWS),
                lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, rays, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, rays, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, capmax), jnp.float32),
            pltpu.VMEM((_ROWS, 9 * capmax), jnp.float32),
            pltpu.VMEM((_QROWS, qtot), jnp.float32),
            pltpu.VMEM((rays, 2), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
        ],
        interpret=interpret,
    )(level_tab, planes_flat, tile_dirs, panel0, expand)
    return out, metrics


def resolve_codes(
    dirs: Array,  # [..., 3] unit ray directions
    code_f: Array,  # [...] f32 sentinel path codes from the kernel
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
):
    """Differentiably re-derive each ray's winning sphere from its path
    code: (min_t, center [..., 3], hit [...]).

    This is the straight-through backward surface (SURVEY §7 stage 5):
    the *discrete* winner choice comes from the kernel (stop-gradient by
    construction); the winner's frame is re-composed from the templates
    and the analytic ray-sphere distance (`SIMD_AVX.h:236-270`) is
    recomputed in XLA, so `jax.grad` flows into camera pose, fractal
    geometry and radii exactly as it does through the strict XLA path.
    """
    shape = code_f.shape
    code = jax.lax.stop_gradient(code_f).astype(jnp.int32).reshape(-1)
    flat_dirs = dirs.reshape(-1, 3)
    hit = code >= 1

    depth = cfg.max_depth
    pow9 = [9**k for k in range(depth + 2)]
    # level = floor(log9 code): count thresholds passed.
    level = jnp.zeros_like(code)
    for k in range(1, depth + 1):
        level = level + (code >= pow9[k]).astype(jnp.int32)
    pow_tab = jnp.asarray(pow9, jnp.int32)
    rem = code - jnp.take(pow_tab, level)  # digits only

    ratio = fractal.radius_ratio
    radius0 = fractal.root_radius
    frame = jnp.broadcast_to(root, (code.shape[0], 3, 4))
    radius = radius0
    for k in range(depth):
        # Base-9 digit for expansion step k (most significant first).
        p = jnp.take(pow_tab, jnp.maximum(level - 1 - k, 0))
        d = (rem // p) % 9
        scale = (1.0 + ratio) * radius
        tmpl = templates.at[:, :, 3].multiply(scale)  # [9, 3, 4]
        onehot = (d[:, None] == jnp.arange(9)[None, :]).astype(jnp.float32)
        chosen = jnp.einsum(
            "nj,jab->nab", onehot, tmpl,
            precision=jax.lax.Precision.HIGHEST,
        )
        from sphereflake_tpu.ops.transforms import rt_multiply

        new_frame = rt_multiply(frame, chosen)
        take = (k < level)[:, None, None]
        frame = jnp.where(take, new_frame, frame)
        radius = radius * ratio

    center = frame[:, :, 3]
    r_hit = radius0 * fractal.radius_ratio ** level.astype(jnp.float32)
    tca = jnp.sum(flat_dirs * center, axis=-1)
    d2 = jnp.sum(center * center, axis=-1) - tca * tca
    from sphereflake_tpu.ops.intersect import safe_sqrt

    t = tca - safe_sqrt(r_hit * r_hit - d2)
    min_t = jnp.where(hit, t, _BIG)
    center = jnp.where(hit[:, None], center, 0.0)
    return (
        min_t.reshape(shape),
        center.reshape(*shape, 3),
        hit.reshape(shape),
    )
