"""Parity tests for the binned traversal (global expansion + tile
binning + pairs kernel). The binning must be a conservative superset of
the per-tile frustum cull, so results match the per-tile pallas kernel
exactly up to f32 winner ties."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer


def _cfg(algorithm, **kw):
    base = dict(
        width=128, height=96, max_depth=2, tile_h=32, tile_w=32,
        max_frontier=512, algorithm=algorithm,
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("depth", [0, 2, 3])
def test_binned_matches_pallas(depth):
    scene = default_scene()
    gb = render_gbuffer(scene, _cfg("binned", max_depth=depth))
    gp = render_gbuffer(scene, _cfg("pallas", max_depth=depth))
    hb, hp = np.asarray(gb.hit), np.asarray(gp.hit)
    assert (hb == hp).mean() > 0.999
    both = hb & hp
    tb, tp = np.asarray(gb.min_t)[both], np.asarray(gp.min_t)[both]
    assert np.isclose(tb, tp, rtol=1e-4, atol=1e-4).mean() > 0.999


def test_binned_off_center_camera():
    """A pose where projection intervals are asymmetric."""
    scene = default_scene()
    cam = dataclasses.replace(
        scene.camera,
        yaw=scene.camera.yaw + 0.3,
        pitch=scene.camera.pitch + 0.2,
    )
    scene = dataclasses.replace(scene, camera=cam)
    gb = render_gbuffer(scene, _cfg("binned"))
    gs = render_gbuffer(scene, _cfg("strict", tile_h=32, tile_w=64))
    hb, hs = np.asarray(gb.hit), np.asarray(gs.hit)
    assert (hb == hs).mean() > 0.999
    both = hb & hs
    tb, ts = np.asarray(gb.min_t)[both], np.asarray(gs.min_t)[both]
    assert np.isclose(tb, ts, rtol=1e-4, atol=1e-4).mean() > 0.995


def test_binned_gradients_flow():
    scene = default_scene()
    cfg = _cfg("binned")

    def loss(s):
        gb = render_gbuffer(s, cfg)
        return jnp.sum(gb.position) / (cfg.width * cfg.height)

    g = jax.grad(loss)(scene)
    total = sum(
        float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(total) and total > 0.0


def test_binned_metrics_sane():
    gb = render_gbuffer(default_scene(), _cfg("binned"))
    assert int(gb.metrics.overflow) == 0
    assert int(gb.metrics.max_depth_reached) == 2
    assert int(gb.metrics.nodes_visited) > 0
