"""Measure per-tile frontier/queue sizes for the v2 kernel design.

Simulates the planned frustum-cull expansion per screen tile at the
bench pose and reports, per level, the max/mean live node count over all
tiles — the data that sets the kernel's static per-level caps.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from sphereflake_tpu.camera import pixel_grid, ray_directions
from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.transforms import rt_multiply


def tile_frustum_planes(dirs, cfg):
    """[T, 4, 3] inward unit normals of each tile's bounding frustum."""
    H, W = cfg.height, cfg.width
    th, tw = cfg.tile_h, cfg.tile_w
    ty, tx = H // th, W // tw
    # Corner pixel coords per tile, extended half a pixel outward.
    y0 = jnp.arange(ty, dtype=jnp.float32) * th - 0.5
    x0 = jnp.arange(tx, dtype=jnp.float32) * tw - 0.5
    y1 = y0 + th
    x1 = x0 + tw
    scene = default_scene()

    def dirs_at(xs, ys):
        return ray_directions(scene.camera, xs, ys, W, H)

    gy0, gx0 = jnp.meshgrid(y0, x0, indexing="ij")
    gy1, gx1 = jnp.meshgrid(y1, x1, indexing="ij")
    c_tl = dirs_at(gx0, gy0).reshape(-1, 3)
    c_tr = dirs_at(gx1, gy0).reshape(-1, 3)
    c_br = dirs_at(gx1, gy1).reshape(-1, 3)
    c_bl = dirs_at(gx0, gy1).reshape(-1, 3)
    corners = jnp.stack([c_tl, c_tr, c_br, c_bl], axis=1)  # [T, 4, 3]
    axis = jnp.mean(corners, axis=1)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    nexts = jnp.roll(corners, -1, axis=1)
    n = jnp.cross(corners, nexts)  # [T, 4, 3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    s = jnp.sign(jnp.sum(n * axis[:, None, :], axis=-1, keepdims=True))
    return n * s


def main():
    th = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    tw = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    cfg = RenderConfig(width=1920, height=1080, max_depth=depth,
                       tile_h=th, tile_w=tw, max_frontier=1024)
    scene = default_scene()
    xs, ys = pixel_grid(cfg.width, cfg.height)
    dirs = ray_directions(scene.camera, xs, ys, cfg.width, cfg.height)
    planes = tile_frustum_planes(dirs, cfg)  # [T, 4, 3]
    T = planes.shape[0]
    print(f"tiles: {T} ({th}x{tw} px)", file=sys.stderr)

    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)
    lod_sq = jnp.float32(cfg.lod_factor ** 2)
    ratio = scene.fractal.radius_ratio

    @jax.jit
    def run(planes):
        def per_tile(pl4):
            frames = jnp.broadcast_to(root, (1, 3, 4))
            valid = jnp.ones((1,), bool)
            radius = scene.fractal.root_radius
            lives = []
            frames_pad = jnp.zeros((cap, 3, 4), jnp.float32).at[:1].set(frames)
            valid_pad = jnp.zeros((cap,), bool).at[0].set(True)
            lives.append(jnp.sum(valid_pad.astype(jnp.int32)))
            overflow = jnp.int32(0)
            for level in range(depth):
                scale = (1.0 + ratio) * radius
                tmpl = templates.at[:, :, 3].multiply(scale)
                n_par = min(cap, 9 ** level)
                par = frames_pad[:n_par]
                pv = valid_pad[:n_par]
                children = rt_multiply(par[:, None], tmpl[None, :]).reshape(-1, 3, 4)
                cv = jnp.repeat(pv, 9)
                r_c = radius * ratio
                c = children[:, :, 3]
                dist = jnp.linalg.norm(c, axis=-1)
                lod_ok = (dist - 2.0 * r_c) < lod_sq * r_c
                plane_ok = jnp.all(
                    jnp.einsum("pk,nk->np", pl4, c) >= -2.0 * r_c, axis=-1
                )
                keep = cv & lod_ok & plane_ok
                nkeep = jnp.sum(keep.astype(jnp.int32))
                lives.append(nkeep)
                # compact
                order = jnp.argsort(~keep, stable=True)
                ncap = min(cap, children.shape[0])
                idx = order[:ncap]
                frames_pad = jnp.zeros((cap, 3, 4), jnp.float32).at[
                    : ncap
                ].set(children[idx])
                valid_pad = jnp.zeros((cap,), bool).at[:ncap].set(keep[idx])
                overflow += jnp.maximum(nkeep - ncap, 0)
                radius = r_c
            return jnp.stack(lives), overflow

        return jax.lax.map(per_tile, planes, batch_size=16)

    lives, overflow = run(planes)
    lives = np.asarray(lives)  # [T, depth+1]
    print(f"overflow(total, cap={cap}): {int(np.asarray(overflow).sum())}")
    for L in range(depth + 1):
        col = lives[:, L]
        print(
            f"level {L}: max={col.max():6d} mean={col.mean():8.1f} "
            f"p99={np.percentile(col, 99):8.0f}"
        )
    q = lives.sum(axis=1)
    print(
        f"queue len: max={q.max()} mean={q.mean():.1f} "
        f"p99={np.percentile(q, 99):.0f}"
    )


if __name__ == "__main__":
    main()
