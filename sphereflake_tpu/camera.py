"""Differentiable camera → frustum-corner ray parameterization.

The reference's tracer is parameterized not by a view matrix but by the
three frustum-corner points topLeft/topRight/bottomLeft
(`camera.h:37-53`), and generates rays by bilinear interpolation of those
corners (`Sphereflake.cpp:162-167`). We keep the exact same
parameterization so camera-pose gradients flow through the identical
surface.

Quirk preserved: the corner scaling is `tan(fov/2) / vec3(-aspect,1,0).length()`
where GLM's member `.length()` is the *component count* (3), so
d = tan(fov_rad/2) / 3 (`camera.h:111-114`).
"""

from __future__ import annotations

import jax.numpy as jnp

from sphereflake_tpu.config import CameraParams
from sphereflake_tpu.ops.transforms import look_rotation, normalize


def camera_scaling(fov_deg):
    """`camera.h:111-114` (including the .length()==3 quirk)."""
    return jnp.tan(jnp.deg2rad(fov_deg) * 0.5) / 3.0


def corner_rays(cam: CameraParams, aspect: float):
    """Return (origin, top_left, top_right, bottom_left), each [3].

    `camera.h:37-53`: corner = position + R @ (±aspect·d, ±d, -1).
    """
    rot = look_rotation(cam.yaw, cam.pitch, cam.roll)
    d = camera_scaling(cam.fov)
    a = jnp.asarray(aspect, dtype=jnp.float32)
    top_left = cam.position + rot @ jnp.stack([-a * d, d, -jnp.ones_like(d)])
    top_right = cam.position + rot @ jnp.stack([a * d, d, -jnp.ones_like(d)])
    bottom_left = cam.position + rot @ jnp.stack([-a * d, -d, -jnp.ones_like(d)])
    return cam.position, top_left, top_right, bottom_left


def ray_directions(cam: CameraParams, xs, ys, width: int, height: int):
    """Normalized world-space ray directions for pixel coords (xs, ys).

    Matches `Sphereflake.cpp:149-167`: uv = (x/W, y/H);
    target = TL + (TR-TL)·uvx + (BL-TL)·uvy; dir = normalize(target - origin).
    xs/ys broadcast; returns [..., 3] float32.
    """
    origin, tl, tr, bl = corner_rays(cam, width / height)
    uvx = (jnp.asarray(xs, jnp.float32) / width)[..., None]
    uvy = (jnp.asarray(ys, jnp.float32) / height)[..., None]
    target = tl + (tr - tl) * uvx + (bl - tl) * uvy
    return normalize(target - origin)


def pixel_grid(width: int, height: int):
    """Integer pixel-coordinate grids xs, ys of shape [height, width].

    The reference traces rays *at* integer pixel coordinates (uv = x/W,
    not (x+0.5)/W) — see `Sphereflake.cpp:117-127` — so we do too.
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    return xs, ys
