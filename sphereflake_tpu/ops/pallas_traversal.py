"""Fused Pallas traversal kernel — the production TPU fast path.

One `pallas_call` renders the whole G-buffer: the grid walks screen
tiles; each grid step traverses the 9-ary sphereflake for its tile.
Semantics match `trace_tile_fast` (the tile-as-packet reading of the
reference's traversal, `Sphereflake.h:86-226`): per-node bounding(2r) +
LOD culls decide which spheres are *candidates*; per-ray
bounding/LOD/self tests decide hits.

TPU-native design (v3 — the latency-aware round-2 rewrite):

- **A tile is exactly one vreg.** 1024 rays = [8, 128] f32, so every
  per-ray op runs at full VPU occupancy and the dirs/out blocks
  ([3, 8, 128] / [2, 8, 128]) have zero DMA padding waste.
- **Frustum culling, not cones.** Each tile's ray bundle is exactly the
  convex hull of its 4 corner rays (bilinear corner interpolation,
  `Sphereflake.cpp:162-167`), so 4 plane tests dilated by the bounding
  radius 2r give a tight, exactly conservative cull — the TPU analogue
  of the reference's per-packet movemask early-out
  (`Sphereflake.h:140-144`), hoisted from per-ray to per-node.
- **Expansion walks live 128-parent chunks** (`lax.fori_loop` with a
  data-dependent trip count): one [144, 16] @ [16, 128] MXU matmul
  composes all 9 children of a chunk (the reference does a 4x4 SSE
  multiply per visited node, `SIMD_AVX.h:59-81`), children are culled
  lane-major, and survivors are stream-compacted by a **one-hot select
  matmul** — a [cap, 1152] 0/1 matrix applied on the MXU, which is
  exact (each output lane receives exactly one f32 addend) and replaces
  the O(W log W) vector-roll compaction of v2.
- **Per-level candidate queue in SMEM.** Every level's live frontier is
  appended to a per-level queue segment in VMEM, DMA'd once to SMEM;
  the per-ray phase is then a scalar-driven loop over *exactly* the
  live candidates (no 128-padding): each node broadcasts its 7 scalars
  against the whole ray vreg in ~16 VPU ops.
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

_LANES = 128  # parent-chunk width; child width per chunk = 9 * 128
_CHILD_W = 9 * _LANES
TILE_RAYS = 1024  # rays per tile = one [8, 128] vreg

PALLAS_MAX_DEPTH = 7  # f32 path-code exactness bound (2*9^7 < 2^24)


def _ru128(n: int) -> int:
    return ((n + 127) // 128) * 128


def level_caps(cfg: RenderConfig) -> list[int]:
    """Static frontier capacity per level, each a multiple of 128.

    Capacity is cheap: expansion and compaction walk live 128-node
    chunks with data-dependent trip counts, so a generous cap costs
    VMEM/SMEM only, not time. Overflow (survivors beyond the cap) is
    counted and surfaced in the metrics."""
    cap = max(128, (cfg.max_frontier // 128) * 128)
    return [
        min(_ru128(9**level), cap) for level in range(cfg.max_depth + 1)
    ]


def _expansion_matrices(templates: Array, scales: Array) -> Array:
    """[D, 144, 16] per-level stacked compose matrices.

    Child j of a frontier-panel column p is rows [16j, 16j+16) of
    M[level] @ panel[:, p]; the [16, 16] block for child j implements
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
    return m.reshape(D, 9 * _ROWS, _ROWS)


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


def _cumsum_lanes(x, n: int):
    """Inclusive cumsum along lanes of [1, n] int32 via log-shift adds."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    sh = 1
    while sh < n:
        shifted = pltpu.roll(x, sh, axis=1)  # roll right
        x = x + jnp.where(lane >= sh, shifted, 0)
        sh *= 2
    return x


def make_trace_kernel(cfg: RenderConfig):
    """Build the pallas kernel body for one 1024-ray tile per step."""
    depth = cfg.max_depth
    caps = level_caps(cfg)
    capmax = max(caps)
    offs = [0]
    for c in caps:
        offs.append(offs[-1] + c)
    qtot = offs[-1]

    def kernel(
        levels_ref,  # SMEM [4, depth+1]: radius, r^2, 4r^2, lod^2*r
        planes_ref,  # SMEM [1, 1, 12]: 4 inward unit frustum normals
        dirs_ref,  # VMEM [1, 3, 8, 128]
        panel0_ref,  # VMEM [16, caps[0]] initial frontier
        expand_ref,  # VMEM [depth, 144, 16] (dummy when depth == 0)
        out_ref,  # VMEM [1, 2, 8, 128]: t, code
        mout_ref,  # SMEM [1, 1, 8]: qlen, overflow, max_depth, ...
        panel_a,  # VMEM scratch [16, capmax]
        panel_b,  # VMEM scratch [16, capmax]
        childstk,  # VMEM scratch [144, 128] stacked compose output
        children,  # VMEM scratch [16, 9*128] lane-major children
        sel,  # VMEM scratch [128, 9*128] one-hot select (transposed)
        queue_v,  # VMEM scratch [8, qtot]
        queue_s,  # SMEM scratch [8, qtot]
        livec_ref,  # SMEM scratch [depth+2] per-level live counts + misc
        sem,  # DMA semaphore
    ):
        dx = dirs_ref[0, 0]  # [8, 128]
        dy = dirs_ref[0, 1]
        dz = dirs_ref[0, 2]

        panel_a[:, : caps[0]] = panel0_ref[:]
        panels = (panel_a, panel_b)
        live = jnp.int32(1)
        overflow = jnp.int32(0)
        max_level = jnp.int32(0)
        qlen_total = jnp.int32(0)

        # ---- phase 1: levelwise expansion + queue append (node work) ----
        for level in range(depth + 1):
            cap = caps[level]
            off = offs[level]
            cur = panels[level % 2]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

            max_level = jnp.where(live > 0, jnp.int32(level), max_level)
            livec_ref[level] = live
            qlen_total = qlen_total + live

            # Append this level's live nodes to its queue segment
            # (dead lanes carry r2 = -1 so no ray test can pass).
            cx = cur[_TX:_TX + 1, :cap]
            cy = cur[_TY:_TY + 1, :cap]
            cz = cur[_TZ:_TZ + 1, :cap]
            okv = lane < live
            queue_v[_QX:_QX + 1, off:off + cap] = cx
            queue_v[_QY:_QY + 1, off:off + cap] = cy
            queue_v[_QZ:_QZ + 1, off:off + cap] = cz
            queue_v[_QCC:_QCC + 1, off:off + cap] = (
                cx * cx + cy * cy + cz * cz
            )
            queue_v[_QR2:_QR2 + 1, off:off + cap] = jnp.where(
                okv, levels_ref[1, level], -1.0
            )
            queue_v[_QLODR:_QLODR + 1, off:off + cap] = jnp.full(
                (1, cap), 1.0, jnp.float32
            ) * levels_ref[3, level]
            queue_v[_QCODE:_QCODE + 1, off:off + cap] = cur[
                _CODE:_CODE + 1, :cap
            ]
            queue_v[_QSPARE:_QSPARE + 1, off:off + cap] = jnp.zeros(
                (1, cap), jnp.float32
            )

            if level == depth:
                break

            # ---- expansion: compose + frustum-cull + one-hot compact ----
            cap_n = caps[level + 1]
            nxt = panels[(level + 1) % 2]
            nxt[:, :cap_n] = jnp.zeros((_ROWS, cap_n), jnp.float32)
            r_c = levels_ref[0, level + 1]
            lod_rc = levels_ref[3, level + 1]
            n_chunks = (live + _LANES - 1) // _LANES

            def chunk_body(c, total, level=level, cap_n=cap_n, nxt=nxt,
                           cur=cur, r_c=r_c, lod_rc=lod_rc):
                base = pl.multiple_of(c * _LANES, _LANES)
                # All 9 children of the 128-parent chunk in one matmul.
                childstk[:, :] = jax.lax.dot(
                    expand_ref[level],
                    cur[:, pl.ds(base, _LANES)],
                    precision=jax.lax.Precision.HIGHEST,
                )
                for j in range(9):
                    children[:, j * _LANES:(j + 1) * _LANES] = childstk[
                        j * _ROWS:(j + 1) * _ROWS, :
                    ]
                ccx = children[_TX:_TX + 1, :]  # [1, 1152]
                ccy = children[_TY:_TY + 1, :]
                ccz = children[_TZ:_TZ + 1, :]
                cc = ccx * ccx + ccy * ccy + ccz * ccz
                # Conservative LOD: closest possible bounding-sphere hit
                # (dist - 2r) still below the cut (`Sphereflake.h:146`),
                # compared in squared form to skip the sqrt:
                # dist < lodr + 2r  <=>  cc < (lodr + 2r)^2.
                lim = lod_rc + 2.0 * r_c
                keep = cc < lim * lim
                neg2r = -2.0 * r_c
                for p in range(4):
                    d_p = (
                        planes_ref[0, 0, 3 * p] * ccx
                        + planes_ref[0, 0, 3 * p + 1] * ccy
                        + planes_ref[0, 0, 3 * p + 2] * ccz
                    )
                    keep = keep & (d_p >= neg2r)
                keep = keep & (children[_VALID:_VALID + 1, :] > 0.0)

                # One-hot select: survivor w goes to output column
                # total + rank(w). Built transposed ([128, 1152]) so
                # the lane-major cumsum broadcasts along sublanes, and
                # chunked over 128-wide output windows so compaction
                # cost tracks the live count, not the static cap.
                pos = _cumsum_lanes(keep.astype(jnp.int32), _CHILD_W)
                gdst = pos - 1 + total  # [1, 1152] dest column per lane
                count = pos[0, _CHILD_W - 1]
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (_LANES, _CHILD_W), 0
                )
                k0 = total // _LANES
                k1 = jnp.minimum(
                    (total + count + _LANES - 1) // _LANES,
                    jnp.int32(cap_n // _LANES),
                )

                def out_chunk(k, _):
                    obase = pl.multiple_of(k * _LANES, _LANES)
                    sel[:, :] = jnp.where(
                        keep & (gdst - obase == col), 1.0, 0.0
                    )
                    # packed += children @ sel^T — contraction over the
                    # 1152 child lanes. One-hot 0/1 weights keep this
                    # exact: each output lane receives a single f32
                    # addend. (Mosaic lowers only DEFAULT/HIGHEST.)
                    nxt[:, pl.ds(obase, _LANES)] += jax.lax.dot_general(
                        children[:, :],
                        sel[:, :],
                        (((1,), (1,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    return 0

                jax.lax.fori_loop(k0, k1, out_chunk, 0, unroll=False)
                return total + count

            total = jax.lax.fori_loop(
                0, n_chunks, chunk_body, jnp.int32(0), unroll=False,
            )
            live = jnp.minimum(total, cap_n)
            overflow = overflow + jnp.maximum(total - cap_n, 0)
            lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, cap_n), 1)
            nxt[_VALID:_VALID + 1, :cap_n] = jnp.where(
                lane_n < live, 1.0, 0.0
            )
            nxt[_ONE:_ONE + 1, :cap_n] = jnp.ones((1, cap_n), jnp.float32)

        # ---- phase 1.5: queue to SMEM for scalar-driven ray tests ----
        pltpu.make_async_copy(queue_v, queue_s, sem).start()

        mout_ref[0, 0, 0] = qlen_total
        mout_ref[0, 0, 1] = overflow
        mout_ref[0, 0, 2] = max_level
        mout_ref[0, 0, 3] = live
        for k in range(4, 8):
            mout_ref[0, 0, k] = jnp.int32(0)

        pltpu.make_async_copy(queue_v, queue_s, sem).wait()

        # ---- phase 2: per-ray tests over exactly the live candidates ----
        bt = jnp.full((8, _LANES), _BIG, jnp.float32)
        bc = jnp.zeros((8, _LANES), jnp.float32)

        for level in range(depth + 1):
            off = offs[level]

            def node_body(q, carry, off=off):
                bt, bc = carry
                cx = queue_s[_QX, off + q]
                cy = queue_s[_QY, off + q]
                cz = queue_s[_QZ, off + q]
                cc = queue_s[_QCC, off + q]
                r2 = queue_s[_QR2, off + q]
                lodr = queue_s[_QLODR, off + q]
                code = queue_s[_QCODE, off + q]
                # `SIMD_AVX.h:236-270` with origin folded into centers.
                tca = dx * cx + dy * cy + dz * cz  # [8, 128]
                d2 = cc - tca * tca
                # Bounding LOD gate, sqrt-free: the reference's
                # tb = tca - sqrt(4r^2 - d^2) < lodr rearranges to
                # (tca - lodr) < sqrt(.) — true when the lhs is
                # negative, else compared in squared form.
                c1 = tca - lodr
                lod_ok = (c1 < 0.0) | (c1 * c1 < 4.0 * r2 - d2)
                ok = (tca >= 0.0) & lod_ok & (d2 <= r2)
                ts = tca - jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
                better = ok & (ts < bt)
                return (
                    jnp.where(better, ts, bt),
                    jnp.where(better, code, bc),
                )

            bt, bc = jax.lax.fori_loop(
                0, livec_ref[level], node_body, (bt, bc), unroll=False,
            )

        out_ref[0, 0] = bt
        out_ref[0, 1] = bc

    return kernel, qtot, capmax


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_tiles_pallas(
    tile_dirs: Array,  # [T, 1024, 3] unit ray dirs per tile
    tile_planes: Array,  # [T, 4, 3] inward unit frustum plane normals
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
    interpret: bool = False,
):
    """Trace all tiles with the fused kernel (AoS dirs wrapper).

    Returns (min_t [T, 1024], code [T, 1024], metrics [T, 1, 8] int32).
    code is the sentinel-prefixed base-9 path code (0 at miss).
    Non-differentiable by construction (inputs are stop-gradiented);
    gradients flow through `resolve_codes` instead.
    """
    T, rays, _ = tile_dirs.shape
    assert rays == TILE_RAYS, (
        f"pallas path requires {TILE_RAYS}-ray tiles (one [8,128] vreg "
        f"per tile), got {rays}; pick tile_h*tile_w == {TILE_RAYS}"
    )
    # Lane-major ray layout: [T, 3, 8, 128] — zero DMA padding waste.
    dirs_k = jnp.moveaxis(tile_dirs, 2, 1).reshape(T, 3, 8, _LANES)
    out, metrics = trace_tiles_pallas_soa(
        dirs_k, tile_planes, root, templates, fractal, cfg,
        interpret=interpret,
    )
    min_t = out[:, 0].reshape(T, TILE_RAYS)
    code = out[:, 1].reshape(T, TILE_RAYS)
    return min_t, code, metrics


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def trace_tiles_pallas_soa(
    dirs_k: Array,  # [T, 3, 8, 128] lane-major unit ray dirs per tile
    tile_planes: Array,  # [T, 4, 3] inward unit frustum plane normals
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
    interpret: bool = False,
):
    """SoA core of `trace_tiles_pallas`: returns (out [T, 2, 8, 128],
    metrics [T, 1, 8])."""
    assert cfg.max_depth <= PALLAS_MAX_DEPTH, (
        f"pallas path supports max_depth <= {PALLAS_MAX_DEPTH} "
        "(f32 path-code exactness); use an XLA algorithm for deeper"
    )
    T = dirs_k.shape[0]
    sg = jax.lax.stop_gradient
    dirs_k, tile_planes, root, templates, fractal = sg(
        (dirs_k, tile_planes, root, templates, fractal)
    )
    depth = cfg.max_depth
    caps = level_caps(cfg)

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
        else jnp.zeros((1, 9 * _ROWS, _ROWS), jnp.float32)
    )
    panel0 = _initial_panel(root, caps[0])
    planes_flat = tile_planes.reshape(T, 1, 12)

    kernel, qtot, capmax = make_trace_kernel(cfg)
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
                (1, 3, 8, _LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_ROWS, caps[0]), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_expand, 9 * _ROWS, _ROWS),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 2, 8, _LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, 2, 8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_ROWS, capmax), jnp.float32),
            pltpu.VMEM((_ROWS, capmax), jnp.float32),
            pltpu.VMEM((9 * _ROWS, _LANES), jnp.float32),
            pltpu.VMEM((_ROWS, _CHILD_W), jnp.float32),
            pltpu.VMEM((_LANES, _CHILD_W), jnp.float32),
            pltpu.VMEM((_QROWS, qtot), jnp.float32),
            pltpu.SMEM((_QROWS, qtot), jnp.float32),
            pltpu.SMEM((depth + 2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(level_tab, planes_flat, dirs_k, panel0, expand)
    return out, metrics


def resolve_codes_soa(
    dx: Array,  # [N] unit ray direction components
    dy: Array,
    dz: Array,
    code_f: Array,  # [N] f32 sentinel path codes (lo lane) from the kernel
    root: Array,  # [3, 4]
    templates: Array,  # [9, 3, 4]
    fractal: FractalParams,
    cfg: RenderConfig,
    code_hi_f: Array | None = None,  # [N] f32 hi lane (depth > 7)
):
    """Differentiably re-derive each ray's winning sphere from its path
    code, fully SoA: returns (min_t, cx, cy, cz, hit), each [N].

    This is the straight-through backward surface (SURVEY §7 stage 5):
    the *discrete* winner choice comes from the kernel (stop-gradient by
    construction); the winner's frame is re-composed from the templates
    and the analytic ray-sphere distance (`SIMD_AVX.h:236-270`) is
    recomputed in XLA, so `jax.grad` flows into camera pose, fractal
    geometry and radii exactly as it does through the strict XLA path.

    Codes ride two lanes for depth > 7: full code = hi * 9^7 + lo
    (sentinel-prefixed, so level = floor(log9) of the combination);
    base-9 digit extraction never needs the sentinel stripped because
    it always lands above the `% 9`.
    """
    lo = jax.lax.stop_gradient(code_f).astype(jnp.int32).reshape(-1)
    if code_hi_f is None:
        hi = jnp.zeros_like(lo)
    else:
        hi = jax.lax.stop_gradient(code_hi_f).astype(jnp.int32).reshape(-1)
    hit = (lo >= 1) | (hi >= 1)

    depth = cfg.max_depth
    pow9 = [9**k for k in range(8)]  # 9^7 is the largest ever indexed
    # level = floor(log9 code): count thresholds passed per lane.
    level = jnp.zeros_like(lo)
    for k in range(1, min(depth, 7) + 1):
        level = level + ((hi == 0) & (lo >= pow9[k])).astype(jnp.int32)
    # hi carries from LEVEL 7 onward (expand_global splits at 9^7
    # unconditionally), so the hi-lane level count runs at depth == 7
    # too — `depth > 7` here dropped every level-7 winner (round-3
    # advisor finding).
    for k in range(0, max(depth - 7, 0) + 1 if depth >= 7 else 0):
        level = level + (hi >= pow9[k]).astype(jnp.int32) * (
            7 if k == 0 else 1
        )
    pow_tab = jnp.asarray(pow9, jnp.int32)

    ratio = fractal.radius_ratio
    radius0 = fractal.root_radius

    # SoA frame walk: 12 per-ray component arrays instead of [N, 3, 4]
    # tensors — batched 3x3 matmuls pad catastrophically on the MXU
    # (3 -> 128 on both dims), while [N]-shaped FMA chains run at full
    # VPU occupancy. The math is `rt_multiply` unrolled per component.
    n = lo.shape[0]
    r = [jnp.broadcast_to(root[a, b], (n,)) for a in range(3) for b in range(3)]
    t = [jnp.broadcast_to(root[a, 3], (n,)) for a in range(3)]
    radius = radius0
    for k in range(depth):
        # Base-9 digit for expansion step k (most significant first):
        # digit m = level-1-k powers above the bottom; taken from hi
        # when m >= 7 (the sentinel always sits above the % 9).
        m = jnp.maximum(level - 1 - k, 0)
        d_lo = (lo // jnp.take(pow_tab, jnp.minimum(m, 7))) % 9
        if depth > 7:
            d_hi = (hi // jnp.take(pow_tab, jnp.maximum(m - 7, 0))) % 9
            d = jnp.where(m >= 7, d_hi, d_lo)
        else:
            d = d_lo
        scale = (1.0 + ratio) * radius
        oh = [(d == j).astype(jnp.float32) for j in range(9)]
        # Selected template entries per ray (rotation + scaled disp).
        e = [
            sum(oh[j] * templates[j, a, b] for j in range(9))
            for a in range(3)
            for b in range(3)
        ]
        disp = [
            sum(oh[j] * templates[j, a, 3] for j in range(9)) * scale
            for a in range(3)
        ]
        take = (k < level).astype(jnp.float32)
        keep = 1.0 - take
        new_r = [
            sum(r[3 * a + kk] * e[3 * kk + b] for kk in range(3))
            for a in range(3)
            for b in range(3)
        ]
        new_t = [
            sum(r[3 * a + kk] * disp[kk] for kk in range(3)) + t[a]
            for a in range(3)
        ]
        r = [take * nr + keep * rr for nr, rr in zip(new_r, r)]
        t = [take * nt + keep * tt for nt, tt in zip(new_t, t)]
        radius = radius * ratio

    cx, cy, cz = t
    r_hit = radius0 * fractal.radius_ratio ** level.astype(jnp.float32)
    tca = dx * cx + dy * cy + dz * cz
    d2 = cx * cx + cy * cy + cz * cz - tca * tca
    from sphereflake_tpu.ops.intersect import safe_sqrt

    tt = tca - safe_sqrt(r_hit * r_hit - d2)
    min_t = jnp.where(hit, tt, _BIG)
    hf = hit.astype(jnp.float32)
    return min_t, cx * hf, cy * hf, cz * hf, hit


def depth_reached_soa(code_f: Array, cfg: RenderConfig,
                      code_hi_f: Array | None = None) -> Array:
    """Max fractal level present in a batch of (lo, hi) path codes —
    the reference's `m_MaxDepthReached` (`Sphereflake.h:157-160`)."""
    lo = jnp.max(code_f).astype(jnp.int32)
    depth = jnp.zeros((), jnp.int32)
    for k in range(1, min(cfg.max_depth, 7) + 1):
        depth = depth + (lo >= 9**k).astype(jnp.int32)
    if cfg.max_depth >= 7 and code_hi_f is not None:
        hi = jnp.max(code_hi_f).astype(jnp.int32)
        deep = jnp.zeros((), jnp.int32)
        for k in range(1, cfg.max_depth - 7 + 1):
            deep = deep + (hi >= 9**k).astype(jnp.int32)
        depth = jnp.where(hi >= 1, 7 + deep, depth)
    return depth


def resolve_codes(
    dirs: Array,  # [..., 3] unit ray directions
    code_f: Array,  # [...] f32 sentinel path codes from the kernel
    root: Array,
    templates: Array,
    fractal: FractalParams,
    cfg: RenderConfig,
    code_hi_f: Array | None = None,
):
    """AoS wrapper over `resolve_codes_soa`:
    (min_t [...], center [..., 3], hit [...])."""
    shape = code_f.shape
    flat = dirs.reshape(-1, 3)
    min_t, cx, cy, cz, hit = resolve_codes_soa(
        flat[:, 0], flat[:, 1], flat[:, 2], code_f.reshape(-1),
        root, templates, fractal, cfg,
        code_hi_f=None if code_hi_f is None else code_hi_f.reshape(-1),
    )
    center = jnp.stack([cx, cy, cz], axis=-1)
    return (
        min_t.reshape(shape),
        center.reshape(*shape, 3),
        hit.reshape(shape),
    )
