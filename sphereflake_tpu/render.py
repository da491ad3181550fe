"""Full-frame G-buffer rendering: camera -> tiles -> frontier traversal.

This is the TPU-native replacement for the reference's worker-thread
loop (`Sphereflake.cpp:86-214`): instead of threads statistically
sharding the pixel stream, the image is cut into static screen tiles
(the "packets" of the TPU build), each traced by the levelwise frontier
kernel in `ops/traversal.py`. Tiles are processed in batches (lax.map)
to bound the live [rays x frontier] working set.

The output is the reference's G-buffer (`Sphereflake.h:7-11`): a
position plane and a normal plane (camera-relative positions, unit
normals, zeros for sky), plus the reference's live metrics
(`Sphereflake.h:30-58`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from sphereflake_tpu.camera import pixel_grid, ray_directions
from sphereflake_tpu.config import RenderConfig, SceneParams
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops.traversal import (
    TraceResult,
    _BIG,
    shade_gbuffer,
    tile_tracer,
)

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderMetrics:
    """The reference's title-bar counters (`main.cpp:271-294`), computed
    as reductions instead of racy shared fields."""

    max_depth_reached: Array  # [] int32
    nodes_visited: Array  # [] int32 — frontier slots tested
    overflow: Array  # [] int32 — nodes dropped at frontier capacity
    closest_distance: Array  # [] f32 — min over rays of hit t (drives SSAO radius)
    rays_traced: Array  # [] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GBuffer:
    position: Array  # [H, W, 3] camera-relative hit positions (dir * t)
    normal: Array  # [H, W, 3] unit normals, zeros at sky
    min_t: Array  # [H, W] hit distance, _BIG at sky
    hit: Array  # [H, W] bool
    metrics: RenderMetrics


def _tile(img: Array, cfg: RenderConfig) -> Array:
    """[pH, pW, ...] -> [T, R, ...] row-major over (tile_y, tile_x).

    Operates on the padded image (pallas pads to a tile multiple; for
    the XLA paths padded == original)."""
    rest = img.shape[2:]
    x = img.reshape(cfg.tiles_y, cfg.tile_h, cfg.tiles_x, cfg.tile_w, *rest)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(cfg.tiles_y * cfg.tiles_x, cfg.tile_h * cfg.tile_w, *rest)


def _untile(tiles: Array, cfg: RenderConfig) -> Array:
    """[T, R, ...] -> [H, W, ...] inverse of `_tile` (crops padding)."""
    rest = tiles.shape[2:]
    x = tiles.reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w, *rest)
    x = jnp.moveaxis(x, 2, 1)
    x = x.reshape(cfg.padded_height, cfg.padded_width, *rest)
    return x[: cfg.height, : cfg.width]


@partial(jax.jit, static_argnames=("cfg",))
def render_frame(scene: SceneParams, cfg: RenderConfig):
    """The complete pipeline of the reference app's `Render()`
    (`main.cpp:301-335`): trace -> SSAO -> blur x2 -> composite, one fused
    device program. Returns (image [H, W, 3], GBuffer)."""
    from sphereflake_tpu.ops.noise import ssao_noise_texture
    from sphereflake_tpu.ops.post import postprocess

    gb = render_gbuffer(scene, cfg)
    noise = jnp.asarray(ssao_noise_texture(cfg.noise_size))
    image = postprocess(
        gb.position, gb.normal, gb.metrics.closest_distance, scene, cfg, noise
    )
    return image, gb


def trace_tiles(
    tiles: Array,  # [T, R, 3] unit ray dirs
    tile_planes: Array,  # [T, 4, 3] frustum planes (pallas path only)
    scene: SceneParams,
    cfg: RenderConfig,
) -> TraceResult:
    """Trace a batch of ray tiles — the unified dispatch over all
    traversal implementations (`cfg.algorithm`), batched over tiles.
    Differentiable on every path (the pallas path via the path-code
    recompute in `ops/pallas_traversal.resolve_codes`)."""
    root = root_frame(scene.camera.position)
    templates = child_templates(scene.fractal)

    if cfg.algorithm == "binned":
        from sphereflake_tpu.ops.binned import trace_tiles_binned

        min_t, center, hit, depth_r, nodes_n, overflow = trace_tiles_binned(
            tiles, scene, cfg, root, templates
        )
        return TraceResult(
            min_t=min_t,
            center=center,
            hit=hit,
            max_depth_reached=depth_r,
            nodes_visited=nodes_n,
            overflow=overflow,
        )

    if cfg.algorithm == "pallas":
        from sphereflake_tpu.ops.pallas_traversal import (
            resolve_codes,
            trace_tiles_pallas,
        )

        interpret = jax.default_backend() != "tpu"
        _, code, m = trace_tiles_pallas(
            tiles, tile_planes, root, templates, scene.fractal, cfg,
            interpret=interpret,
        )
        min_t, center, hit = resolve_codes(
            tiles, code, root, templates, scene.fractal, cfg
        )
        return TraceResult(
            min_t=min_t,
            center=center,
            hit=hit,
            max_depth_reached=jnp.max(m[:, 0, 2]),
            nodes_visited=jnp.sum(m[:, 0, 0]),
            overflow=jnp.sum(m[:, 0, 1]),
        )

    tracer = tile_tracer(cfg)

    def trace_one(tile_dirs):
        return tracer(tile_dirs, root, templates, scene.fractal, cfg)

    n_tiles = tiles.shape[0]
    batch = max(1, min(cfg.tile_batch, n_tiles))
    if n_tiles % batch == 0 and n_tiles > batch:
        res = jax.lax.map(jax.vmap(trace_one), tiles.reshape(
            n_tiles // batch, batch, *tiles.shape[1:]
        ))
        res = jax.tree.map(lambda x: x.reshape(n_tiles, *x.shape[2:]), res)
    else:
        res = jax.vmap(trace_one)(tiles)
    return TraceResult(
        min_t=res.min_t,
        center=res.center,
        hit=res.hit,
        max_depth_reached=jnp.max(res.max_depth_reached),
        nodes_visited=jnp.sum(res.nodes_visited),
        overflow=jnp.sum(res.overflow),
    )


@partial(jax.jit, static_argnames=("cfg",))
def render_gbuffer(scene: SceneParams, cfg: RenderConfig) -> GBuffer:
    """Render the full-frame G-buffer for `scene` (pure, differentiable)."""
    from sphereflake_tpu.camera import tile_frustum_planes

    # Ray math uses the ORIGINAL width/height for the NDC mapping; the
    # grid extends to the padded dims (extra rows/cols extrapolate the
    # corner interpolation and are cropped by `_untile`).
    xs, ys = pixel_grid(cfg.padded_width, cfg.padded_height)
    dirs = ray_directions(scene.camera, xs, ys, cfg.width, cfg.height)

    tiles = _tile(dirs, cfg)  # [T, R, 3]
    planes = tile_frustum_planes(
        scene.camera, cfg.width, cfg.height, cfg.tile_h, cfg.tile_w,
        block_h=cfg.padded_height, block_w=cfg.padded_width,
    )

    res = trace_tiles(tiles, planes, scene, cfg)
    position_t, normal_t = shade_gbuffer(tiles, res)

    min_t = _untile(res.min_t, cfg)
    hit = _untile(res.hit, cfg)
    metrics = RenderMetrics(
        max_depth_reached=res.max_depth_reached,
        nodes_visited=res.nodes_visited,
        overflow=res.overflow,
        closest_distance=jnp.min(jnp.where(hit, min_t, _BIG)),
        rays_traced=jnp.int32(cfg.width * cfg.height),
    )
    return GBuffer(
        position=_untile(position_t, cfg),
        normal=_untile(normal_t, cfg),
        min_t=min_t,
        hit=hit,
        metrics=metrics,
    )
