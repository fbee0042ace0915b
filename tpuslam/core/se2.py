"""SE(2) pose algebra on fixed-shape arrays.

A pose is an array ``[..., 3]`` holding ``(x, y, theta)``.  All functions are
pure, jittable, and broadcast over leading batch dimensions — the TPU-native
replacement for the reference's scattered Eigen/tf2 pose math
(reference: lesson3/src/plicp_odometry.cc:461-467 ``CreateTfFromXYTheta``,
lesson4 hector ``util/UtilFunctions.h:36-48`` angle normalisation,
lesson6 spa2d.cpp:63-81 node rotation caching).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def wrap_angle(theta: Array) -> Array:
    """Wrap angles to (-pi, pi] (reference: UtilFunctions.h:36-48,
    spa2d.cpp:148-159 angle residual normalisation)."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def identity(batch_shape: tuple = (), dtype=jnp.float32) -> Array:
    return jnp.zeros(batch_shape + (3,), dtype=dtype)


def rotation(theta: Array) -> Array:
    """2x2 rotation matrices, shape [..., 2, 2]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a: Array, b: Array) -> Array:
    """a ∘ b : apply b then a (i.e. T_a @ T_b as homogeneous matrices)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def inverse(p: Array) -> Array:
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = -(c * p[..., 0] + s * p[..., 1])
    y = -(-s * p[..., 0] + c * p[..., 1])
    return jnp.stack([x, y, -p[..., 2]], axis=-1)


def relative(a: Array, b: Array) -> Array:
    """a⁻¹ ∘ b — the motion that takes frame a to frame b."""
    return compose(inverse(a), b)


def transform_points(pose: Array, pts: Array) -> Array:
    """Apply pose [..., 3] to points [..., N, 2] (broadcasting over batch)."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x = pts[..., 0]
    y = pts[..., 1]
    nx = c[..., None] * x - s[..., None] * y + pose[..., 0:1]
    ny = s[..., None] * x + c[..., None] * y + pose[..., 1:2]
    return jnp.stack([nx, ny], axis=-1)


def to_matrix(pose: Array) -> Array:
    """Homogeneous 3x3 matrices, shape [..., 3, 3]."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    row0 = jnp.stack([c, -s, pose[..., 0]], axis=-1)
    row1 = jnp.stack([s, c, pose[..., 1]], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_matrix(mat: Array) -> Array:
    theta = jnp.arctan2(mat[..., 1, 0], mat[..., 0, 0])
    return jnp.stack([mat[..., 0, 2], mat[..., 1, 2], theta], axis=-1)


def interp(a: Array, b: Array, alpha: Array) -> Array:
    """Pose interpolation with shortest-arc angle blending.

    Used by motion-distortion correction (reference:
    lesson5/src/lidar_undistortion.cc:398-447 per-beam rotation/translation
    linear interpolation between bracketing IMU/odom samples)."""
    alpha = jnp.asarray(alpha)
    dxy = b[..., :2] - a[..., :2]
    dth = wrap_angle(b[..., 2] - a[..., 2])
    xy = a[..., :2] + alpha[..., None] * dxy
    th = wrap_angle(a[..., 2] + alpha * dth)
    return jnp.concatenate([xy, th[..., None]], axis=-1)


def exp(twist: Array) -> Array:
    """SE(2) exponential map from a twist (vx, vy, omega)."""
    vx, vy, w = twist[..., 0], twist[..., 1], twist[..., 2]
    small = jnp.abs(w) < 1e-6
    w_safe = jnp.where(small, jnp.ones_like(w), w)
    sw, cw = jnp.sin(w_safe), jnp.cos(w_safe)
    a = jnp.where(small, 1.0 - w * w / 6.0, sw / w_safe)
    b = jnp.where(small, w / 2.0, (1.0 - cw) / w_safe)
    x = a * vx - b * vy
    y = b * vx + a * vy
    return jnp.stack([x, y, wrap_angle(w)], axis=-1)


def log(pose: Array) -> Array:
    """SE(2) logarithm map to a twist."""
    x, y, th = pose[..., 0], pose[..., 1], wrap_angle(pose[..., 2])
    small = jnp.abs(th) < 1e-6
    th_safe = jnp.where(small, jnp.ones_like(th), th)
    half = th_safe / 2.0
    cot = half / jnp.tan(half)
    a = jnp.where(small, 1.0 - th * th / 12.0, cot)  # (th/2)cot(th/2) series
    b = jnp.where(small, -th / 2.0, -half)
    vx = a * x - b * y
    vy = b * x + a * y
    return jnp.stack([vx, vy, th], axis=-1)
