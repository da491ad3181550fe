"""Gradient-descent fitting of scene parameters to a target G-buffer.

BASELINE config 4: differentiate the renderer end-to-end and fit
camera pose / fractal / SSAO parameters by gradient descent against a
target. The loss surface is the G-buffer (position + normal planes) —
the same planes the reference's tracer produces (`Sphereflake.h:7-11`)
— so the gradients flow through ray generation (`camera.py`), the
traversal (any `cfg.algorithm`, including the Pallas production path
via its path-code recompute), and the analytic intersection.

Single-device and mesh-sharded (`parallel.fit_step_sharded`) drivers
share the same loss definition; the sharded path psum-all-reduces
parameter gradients over the tile mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from sphereflake_tpu.config import RenderConfig, SceneParams
from sphereflake_tpu.render import render_gbuffer

Array = Any


def gbuffer_loss(
    scene: SceneParams, target_pos: Array, target_nrm: Array, cfg: RenderConfig
):
    """Mean-squared G-buffer error (matches `parallel.fit_step_sharded`)."""
    gb = render_gbuffer(scene, cfg)
    n_pix = cfg.width * cfg.height
    err = jnp.sum((gb.position - target_pos) ** 2) + jnp.sum(
        (gb.normal - target_nrm) ** 2
    )
    return err / n_pix


@partial(jax.jit, static_argnames=("cfg",))
def fit_step(
    scene: SceneParams, target_pos: Array, target_nrm: Array, cfg: RenderConfig
):
    """(loss, grads) for one single-device step."""
    return jax.value_and_grad(gbuffer_loss)(scene, target_pos, target_nrm, cfg)


@dataclasses.dataclass
class FitResult:
    scene: SceneParams  # best-loss parameters seen (keep_best) or final
    opt_state: Any
    losses: list[float]


def fit(
    scene: SceneParams,
    target_pos: Array,
    target_nrm: Array,
    cfg: RenderConfig,
    steps: int = 100,
    learning_rate: float = 2e-3,
    optimizer: optax.GradientTransformation | None = None,
    opt_state: Any = None,
    mesh=None,
    param_filter: Callable[[SceneParams], SceneParams] | None = None,
    log_every: int = 0,
    keep_best: bool = True,
) -> FitResult:
    """Run an optax fitting loop; returns the fitted scene + history.

    `param_filter` masks the gradient pytree (e.g. fit only the camera);
    `mesh` switches to the sharded step. Passing `opt_state` resumes a
    checkpointed run. With `keep_best` (default) the returned scene is
    the best-loss iterate — the G-buffer loss is only piecewise smooth
    (silhouette discontinuities), so the last Adam iterate can sit above
    the best one found.
    """
    optimizer = optimizer or optax.adam(learning_rate)
    if opt_state is None:
        opt_state = optimizer.init(scene)

    if mesh is not None:
        from sphereflake_tpu.parallel import fit_step_sharded

        def step_fn(s):
            return fit_step_sharded(s, target_pos, target_nrm, cfg, mesh)
    else:
        def step_fn(s):
            return fit_step(s, target_pos, target_nrm, cfg)

    losses: list[float] = []
    best_scene, best_loss = scene, float("inf")
    for i in range(steps):
        loss, grads = step_fn(scene)
        if param_filter is not None:
            grads = param_filter(grads)
        losses.append(float(loss))
        if losses[-1] < best_loss:
            best_loss, best_scene = losses[-1], scene
        updates, opt_state = optimizer.update(grads, opt_state)
        scene = optax.apply_updates(scene, updates)
        if log_every and i % log_every == 0:
            print(f"fit step {i}: loss {losses[-1]:.6f}", flush=True)
    return FitResult(
        scene=best_scene if keep_best else scene,
        opt_state=opt_state,
        losses=losses,
    )


def camera_only(grads: SceneParams) -> SceneParams:
    """Gradient mask: optimize the camera pose only."""
    zero = jax.tree.map(jnp.zeros_like, grads)
    return dataclasses.replace(zero, camera=grads.camera)
