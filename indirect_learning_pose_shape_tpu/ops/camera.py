"""Weak-perspective camera (SURVEY.md §2.2).

cam = (s, tx, ty): orthographic scale plus 2D translation in NDC; pixel
mapping puts NDC [-1, 1] onto [0, size-1]. Matches utils/oracle.py exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_ndc(x3d: jax.Array, cam: jax.Array) -> jax.Array:
    """x3d [..., N, 3], cam [..., 3] -> NDC 2D points [..., N, 2]."""
    s = cam[..., 0:1, None]
    t = cam[..., None, 1:3]
    return s * x3d[..., :2] + t


def ndc_to_pixel(ndc: jax.Array, image_size: int) -> jax.Array:
    return (ndc + 1.0) * (0.5 * (image_size - 1))


def project_pixel(x3d: jax.Array, cam: jax.Array, image_size: int) -> jax.Array:
    """Weak-perspective projection straight to pixel coordinates."""
    return ndc_to_pixel(project_ndc(x3d, cam), image_size)


def perspective_project_pixel(
    x3d: jax.Array,
    cam_t: jax.Array,
    focal: float,
    image_size: int,
) -> jax.Array:
    """Full perspective projection (vis-path counterpart, SURVEY.md §2.2).

    x3d [..., N, 3] camera-frame points, cam_t [..., 3] translation, focal
    in pixels, principal point at the image centre. The z-guard keeps
    gradients finite for points that wander behind the camera during
    optimization.
    """
    p = x3d + cam_t[..., None, :]
    z = jnp.maximum(p[..., 2:3], 1e-3)
    centre = (image_size - 1) / 2.0
    return focal * p[..., :2] / z + centre
