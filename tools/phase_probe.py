"""Phase-isolation timing probe for the Pallas traversal kernel.

Builds kernel variants with phases disabled to locate the per-frame
bottleneck on real TPU. Throwaway diagnostic tooling.

Usage: python tools/phase_probe.py [variant ...]
Variants: empty, append, expand, compactq, full  (default: all)
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphereflake_tpu.camera import pixel_grid, ray_directions, tile_frustum_planes
from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops import pallas_traversal as PT
from sphereflake_tpu.render import _tile

W, H, DEPTH, CAP = 1920, 1080, 6, 512
TILE_H, TILE_W = 36, 32


def make_variant_kernel(cfg, rays, variant):
    depth = cfg.max_depth
    caps = PT.level_caps(cfg)
    offs = [0]
    for c in caps:
        offs.append(offs[-1] + c)
    qtot = offs[-1]
    n_chunks = qtot // PT._LANES

    do_expand = variant in ("expand", "compactq", "full", "noray")
    do_append = variant in ("append", "expand", "compactq", "full", "noray")
    do_compactq = variant in ("compactq", "full")
    do_ray = variant == "full"

    def kernel(levels_ref, planes_ref, dirs_ref, panel0_ref, expand_ref,
               out_ref, mout_ref, panel, children, queue, best, live_ref):
        dx = dirs_ref[0, :, 0:1]
        dy = dirs_ref[0, :, 1:2]
        dz = dirs_ref[0, :, 2:3]
        panel[:, : caps[0]] = panel0_ref[:]
        best[:, 0:1] = jnp.full((rays, 1), PT._BIG, jnp.float32)
        best[:, 1:2] = jnp.zeros((rays, 1), jnp.float32)
        live_ref[0] = jnp.int32(1)
        live_ref[1] = jnp.int32(0)
        live_ref[2] = jnp.int32(0)
        live_ref[3] = jnp.int32(0)

        for level in range(depth + 1):
            cap = caps[level]
            off = offs[level]
            live = live_ref[0]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

            if do_append:
                cx = panel[PT._TX:PT._TX + 1, :cap]
                cy = panel[PT._TY:PT._TY + 1, :cap]
                cz = panel[PT._TZ:PT._TZ + 1, :cap]
                okv = lane < live
                queue[PT._QX:PT._QX + 1, off:off + cap] = cx
                queue[PT._QY:PT._QY + 1, off:off + cap] = cy
                queue[PT._QZ:PT._QZ + 1, off:off + cap] = cz
                queue[PT._QCC:PT._QCC + 1, off:off + cap] = cx * cx + cy * cy + cz * cz
                queue[PT._QR2:PT._QR2 + 1, off:off + cap] = jnp.where(
                    okv, levels_ref[1, level], -1.0)
                queue[PT._QLODR:PT._QLODR + 1, off:off + cap] = jnp.full(
                    (1, cap), 1.0, jnp.float32) * levels_ref[3, level]
                queue[PT._QCODE:PT._QCODE + 1, off:off + cap] = panel[
                    PT._CODE:PT._CODE + 1, :cap]
                queue[PT._QSPARE:PT._QSPARE + 1, off:off + cap] = jnp.zeros(
                    (1, cap), jnp.float32)

            if level == depth:
                break

            if do_expand:
                cap_n = caps[level + 1]
                width = 9 * cap

                @pl.when(live > 0)
                def _():
                    for j in range(9):
                        children[:, j * cap:(j + 1) * cap] = jax.lax.dot(
                            expand_ref[level, j], panel[:, :cap],
                            precision=jax.lax.Precision.HIGHEST)
                    r_c = levels_ref[0, level + 1]
                    lod_rc = levels_ref[3, level + 1]
                    ccx = children[PT._TX:PT._TX + 1, :width]
                    ccy = children[PT._TY:PT._TY + 1, :width]
                    ccz = children[PT._TZ:PT._TZ + 1, :width]
                    cc = ccx * ccx + ccy * ccy + ccz * ccz
                    dist = jnp.sqrt(jnp.maximum(cc, 1e-20))
                    keep = (dist - 2.0 * r_c) < lod_rc
                    neg2r = -2.0 * r_c
                    for p in range(4):
                        d_p = (planes_ref[0, 0, 3 * p] * ccx
                               + planes_ref[0, 0, 3 * p + 1] * ccy
                               + planes_ref[0, 0, 3 * p + 2] * ccz)
                        keep = keep & (d_p >= neg2r)
                    keep = keep & (children[PT._VALID:PT._VALID + 1, :width] > 0.0)
                    row_lo = PT._TX if level + 1 == depth else 0
                    packed, total = PT._compact_rows(
                        children[row_lo:PT._CODE + 1, :width], keep, width,
                        PT._CODE + 1 - row_lo)
                    new_live = jnp.minimum(total, cap_n)
                    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, cap_n), 1)
                    panel[row_lo:PT._CODE + 1, :cap_n] = packed[:, :cap_n]
                    panel[PT._VALID:PT._VALID + 1, :cap_n] = jnp.where(
                        lane_n < new_live, 1.0, 0.0)
                    panel[PT._ONE:PT._ONE + 1, :cap_n] = jnp.ones((1, cap_n), jnp.float32)
                    live_ref[0] = new_live
                    live_ref[1] += jnp.maximum(total - cap_n, 0)

        if do_compactq:
            keepq = queue[PT._QR2:PT._QR2 + 1, :] > 0.0
            packedq, qlen = PT._compact_rows(queue[:, :], keepq, qtot, PT._QROWS)
            lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, qtot), 1)
            queue[:, :] = packedq
            queue[PT._QR2:PT._QR2 + 1, :] = jnp.where(
                lane_q < qlen, packedq[PT._QR2:PT._QR2 + 1, :], -1.0)
            live_ref[3] = qlen
        else:
            qlen = jnp.int32(qtot)

        if do_ray:
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (rays, PT._LANES), 1)
            for c in range(n_chunks):
                lo = c * PT._LANES

                @pl.when(qlen > lo)
                def _():
                    cx = queue[PT._QX:PT._QX + 1, lo:lo + PT._LANES]
                    cy = queue[PT._QY:PT._QY + 1, lo:lo + PT._LANES]
                    cz = queue[PT._QZ:PT._QZ + 1, lo:lo + PT._LANES]
                    cc = queue[PT._QCC:PT._QCC + 1, lo:lo + PT._LANES]
                    r2 = queue[PT._QR2:PT._QR2 + 1, lo:lo + PT._LANES]
                    lodr = queue[PT._QLODR:PT._QLODR + 1, lo:lo + PT._LANES]
                    tca = dx * cx + dy * cy + dz * cz
                    d2 = cc - tca * tca
                    tb = tca - jnp.sqrt(jnp.maximum(4.0 * r2 - d2, 0.0))
                    ok = (tca >= 0.0) & (tb < lodr) & (d2 <= r2)
                    ts = tca - jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
                    ts = jnp.where(ok, ts, PT._BIG)
                    t_chunk = jnp.min(ts, axis=1, keepdims=True)
                    upd = t_chunk < best[:, 0:1]

                    @pl.when(jnp.any(upd))
                    def _():
                        idx = jnp.min(jnp.where(ts <= t_chunk, lane_r, qtot),
                                      axis=1, keepdims=True)
                        oh = (lane_r == idx).astype(jnp.float32)
                        code_pick = jnp.sum(
                            oh * queue[PT._QCODE:PT._QCODE + 1, lo:lo + PT._LANES],
                            axis=1, keepdims=True)
                        best[:, 0:1] = jnp.where(upd, t_chunk, best[:, 0:1])
                        best[:, 1:2] = jnp.where(upd, code_pick, best[:, 1:2])

        out_ref[0, :, 0:1] = best[:, 0:1]
        out_ref[0, :, 1:2] = best[:, 1:2]
        out_ref[0, :, 2:8] = jnp.zeros((rays, 6), jnp.float32)
        mout_ref[0, 0, 0] = live_ref[3]
        mout_ref[0, 0, 1] = live_ref[1]
        mout_ref[0, 0, 2] = live_ref[2]
        mout_ref[0, 0, 3] = live_ref[0]
        for k in range(4, 8):
            mout_ref[0, 0, k] = jnp.int32(0)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "variant"))
def run_variant(tile_dirs, tile_planes, root, templates, fractal, cfg, variant):
    T, rays, _ = tile_dirs.shape
    depth = cfg.max_depth
    caps = PT.level_caps(cfg)
    capmax = max(caps)
    qtot = sum(caps)
    levels = jnp.arange(depth + 1, dtype=jnp.float32)
    radii = fractal.root_radius * fractal.radius_ratio ** levels
    lod_sq = jnp.float32(cfg.lod_factor ** 2)
    level_tab = jnp.stack([radii, radii * radii, 4.0 * radii * radii, lod_sq * radii])
    scales = (1.0 + fractal.radius_ratio) * radii[:-1]
    expand = PT._expansion_matrices(templates, scales)
    panel0 = PT._initial_panel(root, caps[0])
    planes_flat = tile_planes.reshape(T, 1, 12)
    kernel = make_variant_kernel(cfg, rays, variant)
    out, metrics = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((4, depth + 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 12), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rays, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT._ROWS, caps[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, 9, PT._ROWS, PT._ROWS), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rays, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, rays, 8), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((PT._ROWS, capmax), jnp.float32),
            pltpu.VMEM((PT._ROWS, 9 * capmax), jnp.float32),
            pltpu.VMEM((PT._QROWS, qtot), jnp.float32),
            pltpu.VMEM((rays, 2), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )(level_tab, planes_flat, tile_dirs, panel0, expand)
    return out, metrics


def main():
    variants = sys.argv[1:] or ["empty", "append", "expand", "compactq", "full"]
    cfg = RenderConfig(width=W, height=H, max_depth=DEPTH, tile_h=TILE_H,
                       tile_w=TILE_W, max_frontier=CAP, algorithm="pallas")
    scene = default_scene()
    xs, ys = pixel_grid(cfg.width, cfg.height)
    dirs = ray_directions(scene.camera, xs, ys, cfg.width, cfg.height)
    tiles = _tile(dirs, cfg)
    planes = tile_frustum_planes(scene.camera, cfg.width, cfg.height,
                                 cfg.tile_h, cfg.tile_w)
    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)
    tiles = jax.device_put(tiles)
    rays_frame = W * H
    for v in variants:
        t0 = time.perf_counter()
        out, m = run_variant(tiles, planes, root, templates, scene.fractal, cfg, v)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(4):
            tv = tiles * (1.0 + 1e-6 * i)  # defeat caching
            t0 = time.perf_counter()
            out, m = run_variant(tv, planes, root, templates, scene.fractal, cfg, v)
            jax.block_until_ready(out)
            _ = np.asarray(out[0, 0, 0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{v:10s}: {best*1e3:8.2f} ms/frame  ({rays_frame/best/1e6:8.1f}M rays/s)"
              f"  compile {compile_s:.1f}s  times={[f'{t*1e3:.1f}' for t in times]}",
              flush=True)


if __name__ == "__main__":
    main()
