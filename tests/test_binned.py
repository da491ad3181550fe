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


def test_banded_matches_whole_frame():
    """Banded rendering (per-band bin+trace+resolve inside lax.map, the
    16384^2 enabler) matches the whole-frame binned render. Hits are
    identical; min_t tolerates grazing-silhouette f32 noise (XLA fuses
    FMAs differently inside the map body, and d(sqrt)/d(d2) blows up
    at d2 ~ r2)."""
    import dataclasses

    import numpy as np

    from sphereflake_tpu.config import RenderConfig, default_scene
    from sphereflake_tpu.render import render_gbuffer

    scene = default_scene()
    cfg = RenderConfig(width=256, height=128, max_depth=3, tile_h=32,
                       tile_w=32, algorithm="binned")
    gb_p = render_gbuffer(scene, cfg)
    for rows in (2, 1):
        gb_b = render_gbuffer(
            scene, dataclasses.replace(cfg, band_tile_rows=rows)
        )
        np.testing.assert_array_equal(
            np.asarray(gb_b.hit), np.asarray(gb_p.hit)
        )
        assert int(gb_b.metrics.overflow) == 0
        assert int(gb_b.metrics.max_depth_reached) == int(
            gb_p.metrics.max_depth_reached
        )
        mt_p, mt_b = np.asarray(gb_p.min_t), np.asarray(gb_b.min_t)
        close = np.isclose(mt_p, mt_b, rtol=1e-5, atol=1e-5)
        assert close.mean() > 0.995
        hit = np.asarray(gb_p.hit)
        assert np.abs(np.where(hit, mt_p - mt_b, 0.0)).max() < 1e-2


def test_deep_config_matches_shallow_on_shallow_scene():
    """max_depth > 7 engages the two-lane path codes and compacted
    expansion; on a scene whose LOD cut stops well before level 7 the
    output must be identical to the shallow config."""
    import numpy as np

    from sphereflake_tpu.config import RenderConfig, default_scene
    from sphereflake_tpu.render import render_gbuffer

    scene = default_scene()
    # The default pose's LOD cut plateaus at level 5 (closest hit ~7.2,
    # level-6 admission needs t < 6.7), so depth 6 and depth 9 see the
    # same geometry.
    kw = dict(width=128, height=64, max_depth=6, tile_h=32, tile_w=32,
              algorithm="binned")
    gb_s = render_gbuffer(scene, RenderConfig(**kw))
    kw["max_depth"] = 9
    gb_d = render_gbuffer(scene, RenderConfig(**kw))
    np.testing.assert_array_equal(np.asarray(gb_s.hit), np.asarray(gb_d.hit))
    np.testing.assert_allclose(
        np.asarray(gb_s.min_t), np.asarray(gb_d.min_t), rtol=1e-6, atol=1e-6
    )
    assert int(gb_d.metrics.overflow) == 0
    assert int(gb_d.metrics.max_depth_reached) == int(
        gb_s.metrics.max_depth_reached
    )


def test_deep_dive_reaches_level_8_plus():
    """The reference's marquee interaction: diving toward the fractal
    reveals ever-deeper levels (`Sphereflake.h:146-153` unbounded
    recursion, `main.cpp:213` speed law). Hover 0.002 above a level-1
    child sphere's surface: the LOD cut t < lod^2 * r then admits
    levels > 7, which the production path must reach on its two-lane
    codes (VERDICT r2 item 6)."""
    import numpy as np

    from sphereflake_tpu.config import (
        CameraParams,
        FractalParams,
        RenderConfig,
        SSAOParams,
        SceneParams,
    )
    from sphereflake_tpu.models.sphereflake import child_templates, root_frame
    from sphereflake_tpu.render import render_gbuffer

    fractal = FractalParams.reference_default()
    templates = np.asarray(child_templates(fractal))
    root = np.asarray(root_frame(jnp.zeros(3, jnp.float32)))
    # Dive at the LIMIT POINT of the nested child-0 chain: composing
    # child-0 frames forever converges to a point that has geometry at
    # EVERY level within ~2 * r_k of it, so the LOD cut alone decides
    # the depth reached — no bare-pole luck involved.
    f2, r2p = root, 1.0
    centers = []
    for _ in range(14):
        tm = templates[0].copy()
        tm[:, 3] *= (1.0 + 1.0 / 3.0) * r2p
        f2 = np.concatenate(
            [f2[:, :3] @ tm[:, :3],
             (f2[:, :3] @ tm[:, 3] + f2[:, 3])[:, None]],
            axis=1,
        )
        centers.append(f2[:, 3].copy())
        r2p /= 3.0
    P = centers[-1]
    u = centers[-1] - centers[-3]
    u = u / np.linalg.norm(u)
    pos = P + 0.002 * u

    # Solve the camera orientation for a look direction d:
    # R = Ry(pitch) @ Rx(yaw) (roll 0, `transforms.look_rotation`), so
    # R @ (0,0,-1) = (-cos(yaw) sin(pitch), sin(yaw), -cos(yaw) cos(pitch))
    # => yaw = asin(dy), pitch = atan2(-dx, -dz).
    d = -u
    yaw = np.arcsin(np.clip(d[1], -1, 1))
    pitch = np.arctan2(-d[0], -d[2])

    scene = SceneParams(
        camera=CameraParams(
            position=jnp.asarray(pos, jnp.float32),
            yaw=jnp.float32(yaw),
            pitch=jnp.float32(pitch),
            roll=jnp.float32(0.0),
            fov=jnp.float32(60.0),
        ),
        fractal=fractal,
        ssao=SSAOParams.reference_default(),
    )
    cfg = RenderConfig(width=64, height=32, max_depth=10, tile_h=32,
                       tile_w=32, algorithm="binned", global_cap=1 << 15)
    gb = render_gbuffer(scene, cfg)
    assert float(np.asarray(gb.hit).mean()) > 0.5
    assert float(gb.metrics.closest_distance) < 0.02  # we really are close
    depth = int(gb.metrics.max_depth_reached)
    assert depth >= 8, f"dive only reached level {depth}"
    # Depth-11 agrees where both hit (deeper levels only ADD geometry).
    import dataclasses

    gb11 = render_gbuffer(scene, dataclasses.replace(cfg, max_depth=11))
    both = np.asarray(gb.hit) & np.asarray(gb11.hit)
    mt10 = np.asarray(gb.min_t)[both]
    mt11 = np.asarray(gb11.min_t)[both]
    assert (mt11 <= mt10 + 1e-5).mean() > 0.99
