"""Texture-sampling ops (jnp): the GLSL `texture()` semantics the
reference's post shaders rely on, as differentiable gathers.

Conventions (GL): texel centers at (i + 0.5)/size; NEAREST is
floor(u·size) clamped; LINEAR filters between the two nearest texel
centers; CLAMP_TO_EDGE clamps indices, REPEAT wraps them.

Filter/wrap pairs used by the reference:
- G-buffer textures: NEAREST + CLAMP_TO_EDGE (`main.cpp:183-201`,
  `GLTexture2D.h:79-99`)
- FBO color targets (SSAO/blur sources): LINEAR + CLAMP_TO_EDGE
  (`GLFramebufferObject.cpp:42-45`)
- SSAO noise: LINEAR + REPEAT (`SSAO.cpp:170-174`)
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img, yi, xi):
    """img [H, W, ...] gathered at integer index arrays (already valid)."""
    return img[yi, xi]


def sample_nearest_clamp(img, u, v):
    """GLSL texture() with NEAREST + CLAMP_TO_EDGE. u, v in [0,1] texture
    coords (u → width axis); img [H, W, C] or [H, W]."""
    h, w = img.shape[0], img.shape[1]
    xi = jnp.clip(jnp.floor(u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.floor(v * h).astype(jnp.int32), 0, h - 1)
    return _gather2d(img, yi, xi)


def _bilinear(img, x, y, wrap):
    """Shared LINEAR filter; x = u·W − 0.5 continuous texel coords."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None] if img.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if img.ndim == 3 else (y - y0)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    if wrap == "repeat":
        xa, xb = jnp.mod(x0, w), jnp.mod(x0 + 1, w)
        ya, yb = jnp.mod(y0, h), jnp.mod(y0 + 1, h)
    else:
        xa, xb = jnp.clip(x0, 0, w - 1), jnp.clip(x0 + 1, 0, w - 1)
        ya, yb = jnp.clip(y0, 0, h - 1), jnp.clip(y0 + 1, 0, h - 1)
    p00 = _gather2d(img, ya, xa)
    p01 = _gather2d(img, ya, xb)
    p10 = _gather2d(img, yb, xa)
    p11 = _gather2d(img, yb, xb)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def sample_bilinear_clamp(img, u, v):
    h, w = img.shape[0], img.shape[1]
    return _bilinear(img, u * w - 0.5, v * h - 0.5, "clamp")


def sample_bilinear_repeat(img, u, v):
    h, w = img.shape[0], img.shape[1]
    return _bilinear(img, u * w - 0.5, v * h - 0.5, "repeat")
