"""Pinhole camera model with radial-tangential distortion.

Functional replacement for the reference's hard-coded intrinsics use
(normalization in VINS_ios/feature_tracker.cpp:300-306) plus EuRoC-style
undistortion (the reference relies on pre-calibrated mobile cameras; we
support radtan for dataset replay). All ops batched & jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CameraConfig


def intrinsics_matrix(cam: CameraConfig, dtype=jnp.float32) -> jax.Array:
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def pixel_to_normalized(cam: CameraConfig, uv: jax.Array) -> jax.Array:
    """Pixel coords -> undistorted normalized image-plane coords (x, y).

    With zero distortion this is the reference's normalization
    (feature_tracker.cpp:300-306). With radtan coefficients we invert the
    distortion by fixed-point iteration (8 steps, jit-safe).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    if cam.k1 == 0.0 and cam.k2 == 0.0 and cam.p1 == 0.0 and cam.p2 == 0.0:
        return jnp.stack([x, y], axis=-1)

    xd = jnp.stack([x, y], axis=-1)
    # Clamp each iterate: for points outside the calibrated image (e.g.
    # KLT results that drifted off-frame before the border cull) the
    # fixed-point iteration can diverge to inf/NaN, and a single such
    # value poisons downstream reductions. The clamp bound is far outside
    # any real FOV, so in-image points are unaffected.
    lim = 4.0

    def body(_, xu):
        d = _distort_delta(cam, xu)
        return jnp.clip(xd - d, -lim, lim)

    xu = jax.lax.fori_loop(0, 20, body, xd)
    return xu


def _distort_delta(cam: CameraConfig, xy: jax.Array) -> jax.Array:
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = cam.k1 * r2 + cam.k2 * r2 * r2
    dx = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    dy = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([dx, dy], axis=-1)


def normalized_to_pixel(cam: CameraConfig, xy: jax.Array) -> jax.Array:
    """Normalized coords -> pixel coords (applying distortion)."""
    xyd = xy + (_distort_delta(cam, xy)
                if (cam.k1 or cam.k2 or cam.p1 or cam.p2) else 0.0)
    u = xyd[..., 0] * cam.fx + cam.cx
    v = xyd[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def project(points_cam: jax.Array) -> jax.Array:
    """3D camera-frame points -> normalized image plane (perspective divide)."""
    z = points_cam[..., 2:3]
    return points_cam[..., 0:2] / jnp.where(jnp.abs(z) < 1e-8,
                                            jnp.sign(z) * 1e-8 + 1e-12, z)


def in_border(cam: CameraConfig, uv: jax.Array, border: int = 1) -> jax.Array:
    """Border validity mask (reference feature_tracker.cpp inBorder)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= border) & (u < cam.width - border)
        & (v >= border) & (v < cam.height - border)
    )
