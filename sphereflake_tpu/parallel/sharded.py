"""Sharded rendering and fitting over a 2D screen-tile device mesh.

shard_map SPMD: every device renders its own image block with the same
frontier-traversal kernel used single-chip (its tile set is just
smaller), then:

- forward: no cross-device communication at all for the G-buffer (rays
  are independent — `Sphereflake.cpp:139-150`'s statistical sharding had
  the same property); metrics are psum/pmax/pmin reductions.
- backward (fitting): each device differentiates its local loss; scene
  parameter gradients are `psum` all-reduced over both mesh axes — the
  TPU-native stand-in for the reference's shared-memory counters, riding
  ICI and overlapped with the backward sweep by XLA's scheduler.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sphereflake_tpu.camera import ray_directions, tile_frustum_planes
from sphereflake_tpu.config import RenderConfig, SceneParams
from sphereflake_tpu.ops.traversal import _BIG, shade_gbuffer
from sphereflake_tpu.render import (
    GBuffer,
    RenderMetrics,
    _tile,
    _untile,
    trace_tiles,
)

Array = Any


def _block_cfg(cfg: RenderConfig, mesh: Mesh) -> RenderConfig:
    """Per-device block configuration (cfg for one mesh cell's slice)."""
    my, mx = mesh.devices.shape
    if cfg.height % (my * cfg.tile_h) or cfg.width % (mx * cfg.tile_w):
        raise ValueError(
            f"image {cfg.width}x{cfg.height} with tiles "
            f"{cfg.tile_w}x{cfg.tile_h} does not divide over mesh {my}x{mx}"
        )
    return dataclasses.replace(
        cfg, height=cfg.height // my, width=cfg.width // mx
    )


def _render_block(scene: SceneParams, cfg: RenderConfig, bcfg: RenderConfig):
    """Render this device's image block (runs inside shard_map).

    Routed through the unified `render.trace_tiles` dispatch, so every
    algorithm — including the Pallas production kernel — runs sharded."""
    iy = jax.lax.axis_index("ty")
    ix = jax.lax.axis_index("tx")
    y0 = (iy * bcfg.height).astype(jnp.float32)
    x0 = (ix * bcfg.width).astype(jnp.float32)

    ys, xs = jnp.meshgrid(
        jnp.arange(bcfg.padded_height, dtype=jnp.float32),
        jnp.arange(bcfg.padded_width, dtype=jnp.float32),
        indexing="ij",
    )
    # Global pixel coordinates; ray math uses the FULL image dimensions.
    dirs = ray_directions(scene.camera, xs + x0, ys + y0, cfg.width, cfg.height)

    tiles = _tile(dirs, bcfg)
    planes = tile_frustum_planes(
        scene.camera, cfg.width, cfg.height, bcfg.tile_h, bcfg.tile_w,
        x_off=x0, y_off=y0,
        block_h=bcfg.padded_height, block_w=bcfg.padded_width,
    )

    # The binned path bins nodes into block-local tiles: it needs the
    # full-frame dims (the corner-ray basis is global) and this block's
    # pixel offset (VERDICT r2: block configs anchored at (0, 0) binned
    # every non-origin block wrong).
    res = trace_tiles(
        tiles, planes, scene, bcfg,
        frame=(cfg.width, cfg.height, x0, y0),
    )
    pos_t, nrm_t = shade_gbuffer(tiles, res)
    return (
        _untile(pos_t, bcfg),
        _untile(nrm_t, bcfg),
        _untile(res.min_t, bcfg),
        _untile(res.hit, bcfg),
        res,
    )


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def render_gbuffer_sharded(
    scene: SceneParams, cfg: RenderConfig, mesh: Mesh
) -> GBuffer:
    """Full-frame G-buffer with image blocks sharded over `mesh`."""
    bcfg = _block_cfg(cfg, mesh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(
            P("ty", "tx"),
            P("ty", "tx"),
            P("ty", "tx"),
            P("ty", "tx"),
            P(),
        ),
        # vma tracking cannot see through pallas_call out_shapes; all
        # cross-device movement here is explicit (psum/pmax/pmin).
        check_vma=False,
    )
    def run(scene):
        pos, nrm, min_t, hit, res = _render_block(scene, cfg, bcfg)
        metrics = RenderMetrics(
            max_depth_reached=jax.lax.pmax(
                jax.lax.pmax(jnp.max(res.max_depth_reached), "ty"), "tx"
            ),
            nodes_visited=jax.lax.psum(
                jax.lax.psum(jnp.sum(res.nodes_visited), "ty"), "tx"
            ),
            overflow=jax.lax.psum(
                jax.lax.psum(jnp.sum(res.overflow), "ty"), "tx"
            ),
            closest_distance=jax.lax.pmin(
                jax.lax.pmin(
                    jnp.min(jnp.where(res.hit, res.min_t, _BIG)), "ty"
                ),
                "tx",
            ),
            rays_traced=jnp.int32(cfg.width * cfg.height),
        )
        return pos, nrm, min_t, hit, metrics

    pos, nrm, min_t, hit, metrics = run(scene)
    return GBuffer(position=pos, normal=nrm, min_t=min_t, hit=hit, metrics=metrics)


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=())
def fit_step_sharded(
    scene: SceneParams,
    target_position: Array,
    target_normal: Array,
    cfg: RenderConfig,
    mesh: Mesh,
):
    """One sharded fitting step: local G-buffer L2 loss, psum'd gradients.

    Returns (loss, grads) with grads replicated — feed them to any optax
    optimizer on the host side or in a jitted update.
    """
    bcfg = _block_cfg(cfg, mesh)
    n_pix = cfg.width * cfg.height

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("ty", "tx"), P("ty", "tx")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(scene, tgt_pos, tgt_nrm):
        def local_loss(s):
            pos, nrm, _, _, _ = _render_block(s, cfg, bcfg)
            err = jnp.sum((pos - tgt_pos) ** 2) + jnp.sum((nrm - tgt_nrm) ** 2)
            return err / n_pix

        loss, grads = jax.value_and_grad(local_loss)(scene)
        loss = jax.lax.psum(jax.lax.psum(loss, "ty"), "tx")
        # Explicit gradient all-reduce over both mesh axes (with
        # check_vma=False the transpose no longer inserts it for us) —
        # this is the `psum` the reference's shared-memory accumulation
        # maps to. Guarded by the single-vs-sharded gradient parity test.
        grads = jax.tree.map(
            lambda g: jax.lax.psum(jax.lax.psum(g, "ty"), "tx"), grads
        )
        return loss, grads

    return run(scene, target_position, target_normal)
