"""Fused Pallas traversal kernel — the production TPU fast path.

One `pallas_call` renders the whole G-buffer: the grid walks screen
tiles; each grid step traverses the 9-ary sphereflake for its tile with
the frontier resident in VMEM. This replaces the XLA levelwise path
(`ops/traversal.py:trace_tile_fast`) whose per-level [rays, frontier]
intermediates round-trip HBM and whose compaction lowers to gathers.

Semantics match `trace_tile_fast` (the tile-as-packet reading of the
reference's traversal, `Sphereflake.h:86-226`): per-level bounding(2r) +
LOD gate + self-sphere(r) tests with tile-cone-culled frontier
expansion. Differences from the reference are the same ones the XLA
fast path has (whole-tile cone instead of 8-lane movemask early-outs,
`Sphereflake.h:140-144`).

TPU-native design notes:

- **Frontier as a row-SoA [16, C] panel** (9 rotation rows, 3
  translation rows, path code, valid flag, constant-one, spare). A
  child expansion is then one [16, 16] @ [16, C] matmul per template —
  the whole affine compose + code/valid bookkeeping as a single MXU op
  (the reference does a 4x4 SSE multiply per visited node,
  `SIMD_AVX.h:59-81`).
- **Log-shift stream compaction** packs cone-surviving children left
  in O(log N) vector rolls — no gathers, no sorts, all VPU. (Verified
  against a scalar reference for 20k random masks.)
- **Chunked per-ray tests with live-count gating**: rays test the
  frontier 128 lanes at a time; `pl.when` skips chunks beyond the live
  count and whole levels once the frontier dies, so sky tiles cost
  almost nothing (the TPU analogue of the reference's early-outs).
- **Path codes for the backward pass**: the winner's base-9 tree path
  is threaded through the expansion matmuls and emitted per ray, so the
  gradient path can recompute the winning sphere analytically outside
  the kernel (straight-through selection, SURVEY §7) — no backward
  kernel needed.
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

_LANES = 128  # VPU lane width; frontier chunk size for per-ray tests.


def _expansion_matrices(templates: Array, scales: Array) -> Array:
    """[D, 9, 16, 16] per-(level, child) frontier-panel update matrices.

    child_panel = M[level, j] @ parent_panel implements
    `worldTransform = parentTransform * childTransform`
    (`Sphereflake.h:165-169`) on the row-SoA panel, plus path-code and
    valid-flag propagation. templates: [9, 3, 4] unit child frames;
    scales: [D] tangent distances (1 + ratio) * radius_level
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
    """[16, C] frontier panel holding the root frame in slot 0."""
    panel = jnp.zeros((_ROWS, cap), jnp.float32)
    rot = root[:, :3].reshape(9)
    panel = panel.at[:9, 0].set(rot)
    panel = panel.at[_TX:_TZ + 1, 0].set(root[:, 3])
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


def make_trace_kernel(cfg: RenderConfig, rays: int):
    """Build the pallas kernel body for a tile of `rays` rays."""
    cap = cfg.max_frontier
    assert cap % _LANES == 0, "max_frontier must be a multiple of 128"
    chunks = cap // _LANES
    n_child = 9 * cap
    depth = cfg.max_depth

    def kernel(
        levels_ref,  # SMEM [4, depth+1]: radius, r^2, lod*r, unused
        dirs_ref,  # VMEM [1, rays, 3]
        panel0_ref,  # VMEM [16, cap] initial frontier
        expand_ref,  # VMEM [depth, 9, 16, 16] (absent when depth == 0)
        out_ref,  # VMEM [1, rays, 8]: t, cx, cy, cz, code, level, -, -
        mout_ref,  # SMEM [1, 1, 8]: nodes, overflow, max_depth, live, ...
        panel,  # VMEM scratch [16, cap]
        children,  # VMEM scratch [16, 9*cap]
        best,  # VMEM scratch [rays, 8]
        live_ref,  # SMEM scratch [4]
    ):
        dx = dirs_ref[0, :, 0:1]  # [rays, 1]
        dy = dirs_ref[0, :, 1:2]
        dz = dirs_ref[0, :, 2:3]

        # Tile bounding cone (ops/traversal.py:tile_cone).
        sx, sy, sz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)
        inv = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20))
        ax, ay, az = sx * inv, sy * inv, sz * inv
        cos_t = jnp.min(dx * ax + dy * ay + dz * az)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

        panel[:] = panel0_ref[:]
        best[:, 0:1] = jnp.full((rays, 1), _BIG, jnp.float32)
        best[:, 1:8] = jnp.zeros((rays, 7), jnp.float32)
        live_ref[0] = jnp.int32(1)
        live_ref[1] = jnp.int32(0)  # nodes visited
        live_ref[2] = jnp.int32(0)  # overflow
        live_ref[3] = jnp.int32(0)  # max depth reached

        lane_r = jax.lax.broadcasted_iota(jnp.int32, (rays, _LANES), 1)

        for level in range(depth + 1):
            radius = levels_ref[0, level]
            r_sq = levels_ref[1, level]
            lod_r = levels_ref[2, level]
            live = live_ref[0]

            @pl.when(live > 0)
            def _():
                live_ref[1] += live
                live_ref[3] = jnp.int32(level)

            # ---- per-ray tests, one 128-lane chunk at a time ----
            for c in range(chunks):
                lo = c * _LANES

                @pl.when(live > lo)
                def _():
                    cx = panel[_TX:_TX + 1, lo:lo + _LANES]  # [1, 128]
                    cy = panel[_TY:_TY + 1, lo:lo + _LANES]
                    cz = panel[_TZ:_TZ + 1, lo:lo + _LANES]
                    ok = panel[_VALID:_VALID + 1, lo:lo + _LANES] > 0.0
                    cc = cx * cx + cy * cy + cz * cz
                    tca = dx * cx + dy * cy + dz * cz  # [rays, 128]
                    d2 = cc - tca * tca
                    b_gap = jnp.maximum(4.0 * r_sq - d2, 0.0)
                    tb = tca - jnp.sqrt(b_gap)
                    shit = (
                        (tca >= 0.0)
                        & ok
                        & (tb < lod_r)
                        & (d2 <= r_sq)
                    )
                    ts = tca - jnp.sqrt(jnp.maximum(r_sq - d2, 0.0))
                    ts = jnp.where(shit, ts, _BIG)
                    t_lvl = jnp.min(ts, axis=1, keepdims=True)  # [rays, 1]
                    upd = t_lvl < best[:, 0:1]

                    @pl.when(jnp.any(upd))
                    def _():
                        idx = jnp.min(
                            jnp.where(ts <= t_lvl, lane_r, n_child),
                            axis=1,
                            keepdims=True,
                        )
                        oh = (lane_r == idx).astype(jnp.float32)
                        pick = lambda row: jnp.sum(oh * row, axis=1,
                                                   keepdims=True)
                        best[:, 0:1] = jnp.where(upd, t_lvl, best[:, 0:1])
                        best[:, 1:2] = jnp.where(upd, pick(cx), best[:, 1:2])
                        best[:, 2:3] = jnp.where(upd, pick(cy), best[:, 2:3])
                        best[:, 3:4] = jnp.where(upd, pick(cz), best[:, 3:4])
                        best[:, 4:5] = jnp.where(
                            upd,
                            pick(panel[_CODE:_CODE + 1, lo:lo + _LANES]),
                            best[:, 4:5],
                        )
                        best[:, 5:6] = jnp.where(
                            upd, jnp.float32(level), best[:, 5:6]
                        )

            if level == depth:
                break

            # ---- expansion: compose children, cone-cull, compact ----
            @pl.when(live > 0)
            def _():
                for j in range(9):
                    children[:, j * cap:(j + 1) * cap] = jax.lax.dot(
                        expand_ref[level, j],
                        panel[:],
                        precision=jax.lax.Precision.HIGHEST,
                    )

                r_c = levels_ref[0, level + 1]
                lod_rc = levels_ref[2, level + 1]
                ccx = children[_TX:_TX + 1, :]  # [1, 9*cap]
                ccy = children[_TY:_TY + 1, :]
                ccz = children[_TZ:_TZ + 1, :]
                cc = ccx * ccx + ccy * ccy + ccz * ccz
                dist = jnp.sqrt(jnp.maximum(cc, 1e-20))
                # Cone-vs-sphere(2r) + conservative LOD
                # (ops/traversal.py:_cone_cull).
                sin_p = jnp.minimum(2.0 * r_c / dist, 1.0)
                cos_p = jnp.sqrt(jnp.maximum(1.0 - sin_p * sin_p, 0.0))
                cos_sum = cos_t * cos_p - sin_t * sin_p
                cos_b = (ccx * ax + ccy * ay + ccz * az) / dist
                inside = dist <= 2.0 * r_c
                lod_ok = (dist - 2.0 * r_c) < lod_rc
                keep = (
                    (inside | (cos_b >= cos_sum))
                    & lod_ok
                    & (children[_VALID:_VALID + 1, :] > 0.0)
                )

                # Log-shift stream compaction of kept lanes.
                keep_i = keep.astype(jnp.int32)
                pos = _cumsum_lanes(keep_i, n_child)  # inclusive
                total = pos[0, n_child - 1]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_child), 1)
                mv = jnp.where(keep, lane - (pos - 1), 0)
                data = children[:]
                for k in range(_num_steps(n_child)):
                    sh = 1 << k
                    mv_s = _roll_left(mv, sh)
                    take = ((mv_s >> k) & 1) != 0
                    data = jnp.where(take, _roll_left(data, sh), data)
                    mv = jnp.where(take, mv_s - sh, mv)

                new_live = jnp.minimum(total, cap)
                lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
                panel[:] = data[:, :cap]
                panel[_VALID:_VALID + 1, :] = jnp.where(
                    lane_c < new_live, 1.0, 0.0
                )
                panel[_ONE:_ONE + 1, :] = jnp.ones((1, cap), jnp.float32)
                live_ref[0] = new_live
                live_ref[2] += jnp.maximum(total - cap, 0)

        out_ref[0, :, 0:1] = best[:, 0:1]
        out_ref[0, :, 1:2] = best[:, 1:2]
        out_ref[0, :, 2:3] = best[:, 2:3]
        out_ref[0, :, 3:4] = best[:, 3:4]
        out_ref[0, :, 4:5] = best[:, 4:5]
        out_ref[0, :, 5:6] = best[:, 5:6]
        out_ref[0, :, 6:8] = jnp.zeros((rays, 2), jnp.float32)
        mout_ref[0, 0, 0] = live_ref[1]
        mout_ref[0, 0, 1] = live_ref[2]
        mout_ref[0, 0, 2] = live_ref[3]
        mout_ref[0, 0, 3] = live_ref[0]
        mout_ref[0, 0, 4] = jnp.int32(0)
        mout_ref[0, 0, 5] = jnp.int32(0)
        mout_ref[0, 0, 6] = jnp.int32(0)
        mout_ref[0, 0, 7] = jnp.int32(0)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_tiles_pallas(
    tile_dirs: Array,  # [T, R, 3] unit ray dirs per tile
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
    interpret: bool = False,
):
    """Trace all tiles with the fused kernel.

    Returns (out [T, R, 8], metrics [T, 8] int32). out columns:
    t (_BIG at miss), winner center xyz, base-9 path code, level.
    """
    T, rays, _ = tile_dirs.shape
    depth = cfg.max_depth
    cap = cfg.max_frontier

    levels = jnp.arange(depth + 1, dtype=jnp.float32)
    radii = fractal.root_radius * fractal.radius_ratio ** levels
    lod_sq = jnp.float32(cfg.lod_factor**2)
    level_tab = jnp.stack(
        [radii, radii * radii, lod_sq * radii, jnp.zeros_like(radii)]
    )  # [4, depth+1]

    scales = (1.0 + fractal.radius_ratio) * radii[:-1] if depth > 0 else (
        jnp.zeros((0,), jnp.float32)
    )
    expand = (
        _expansion_matrices(templates, scales)
        if depth > 0
        else jnp.zeros((1, 9, _ROWS, _ROWS), jnp.float32)
    )
    panel0 = _initial_panel(root, cap)

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
                (1, rays, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ROWS, cap), lambda i: (0, 0), memory_space=pltpu.VMEM
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
            pltpu.VMEM((_ROWS, cap), jnp.float32),
            pltpu.VMEM((_ROWS, 9 * cap), jnp.float32),
            pltpu.VMEM((rays, 8), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
        ],
        interpret=interpret,
    )(level_tab, tile_dirs, panel0, expand)
    return out, metrics
