"""Parity tests for the fused Pallas traversal kernel.

On CPU CI the kernel runs in interpreter mode (exact same program), so
configs here are tiny. The reference is the XLA fast path, which is
itself golden-tested against the NumPy model (tests/test_golden.py).
Hit masks must agree exactly; t/position/normal tolerances account for
grazing-incidence conditioning (t = tca - sqrt(r^2 - d^2) amplifies
last-ulp center differences between the kernel's frame composition and
the XLA path's near tangency — verified same-winner on TPU).
"""

import dataclasses

import jax
import numpy as np
import pytest

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_gbuffer

_BIG = 1e38


def _cfg(**kw):
    base = dict(
        width=64,
        height=32,
        max_depth=2,
        tile_h=32,
        tile_w=32,
        max_frontier=128,
        tile_batch=4,
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.parametrize("depth", [0, 1, 2])
def test_pallas_matches_fast_path(depth):
    scene = default_scene()
    cfg_p = _cfg(max_depth=depth, algorithm="pallas")
    cfg_f = _cfg(max_depth=depth, algorithm="fast")

    gp = render_gbuffer(scene, cfg_p)
    gf = render_gbuffer(scene, cfg_f)

    hit_p = np.asarray(gp.hit)
    hit_f = np.asarray(gf.hit)
    # Culls on both paths are conservative, so candidate sets match and
    # hit masks agree except at most isolated near-tie boundary lanes.
    assert (hit_p == hit_f).mean() > 0.999
    both = hit_p & hit_f
    tp = np.asarray(gp.min_t)[both]
    tf = np.asarray(gf.min_t)[both]
    agree = np.isclose(tp, tf, rtol=1e-4, atol=1e-4)
    assert agree.mean() > 0.99
    if not agree.all():
        # Disagreements must be near-ties (two spheres at ~equal t whose
        # winner flips under f32 op-order differences), not wrong hits.
        assert np.abs(tp[~agree] - tf[~agree]).max() < 1e-2
    np.testing.assert_allclose(
        np.asarray(gp.position)[both][agree],
        np.asarray(gf.position)[both][agree],
        rtol=1e-4,
        atol=1e-4,
    )
    # Normals divide by the winner radius (~0.1 at depth 2), amplifying
    # grazing-ray positional noise ~10x: near-total 1e-3 agreement, a
    # 1e-2 hard bound.
    nd = np.abs(
        np.asarray(gp.normal)[both][agree]
        - np.asarray(gf.normal)[both][agree]
    )
    assert (nd.max(axis=-1) < 1e-3).mean() > 0.98
    assert nd.max() < 1e-2


def test_pallas_metrics_sane():
    scene = default_scene()
    gb = render_gbuffer(scene, _cfg(algorithm="pallas"))
    assert int(gb.metrics.max_depth_reached) >= 1
    assert int(gb.metrics.nodes_visited) > 0
    assert float(gb.metrics.closest_distance) > 0.0
    assert int(gb.metrics.rays_traced) == 64 * 32


def test_pallas_camera_move_changes_image():
    scene = default_scene()
    cfg = _cfg(algorithm="pallas")
    g1 = render_gbuffer(scene, cfg)
    cam = dataclasses.replace(scene.camera, yaw=scene.camera.yaw + 0.05)
    g2 = render_gbuffer(dataclasses.replace(scene, camera=cam), cfg)
    assert not np.allclose(np.asarray(g1.min_t), np.asarray(g2.min_t))
