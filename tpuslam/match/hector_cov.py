"""Hector sampling-based pose covariance + residual likelihood helpers.

Parity with the reference's (main-path-unused but public) estimators
(reference: lesson4/.../map/OccGridMapUtil.h:249-374):

- residual(state) = sum over beams of ``1 - M(T(state) p)`` (getResidualForState),
- likelihood = ``1 - residual / num_points`` (getLikelihoodForResidual),
- sigma-point covariance: 7 sigma poses (±1.5 cells in x and y, ±0.05 rad,
  plus the pose itself), likelihood-weighted mean and second moments
  (getCovarianceForPose),
- map→world covariance scaling: translation entries scale by the cell
  length, mixed rows by one factor, theta-theta unscaled
  (getCovMatrixWorldCoords).

All vectorized over the sigma-point axis; batched via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.ops.bilinear import interp_value_grad

Array = jax.Array


def residual_for_state(prob_grid: Array, pts: Array, valid: Array,
                       pose_map: Array) -> Array:
    """Sum of ``1 - M`` over valid beams (OccGridMapUtil.h:361-374)."""
    c, s = jnp.cos(pose_map[2]), jnp.sin(pose_map[2])
    tx = c * pts[:, 0] - s * pts[:, 1] + pose_map[0]
    ty = s * pts[:, 0] + c * pts[:, 1] + pose_map[1]
    val, _, _ = interp_value_grad(
        prob_grid, jnp.stack([tx, ty], -1), valid
    )
    return jnp.sum(jnp.where(valid, 1.0 - val, 0.0))


def likelihood_for_state(prob_grid: Array, pts: Array, valid: Array,
                         pose_map: Array) -> Array:
    """``1 - residual/size``; size = total beam count as in the reference
    (it iterates all container entries, OccGridMapUtil.h:349-374) — here the
    valid count, since masked beams contribute no residual."""
    n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    return 1.0 - residual_for_state(prob_grid, pts, valid, pose_map) / n


def sample_covariance(prob_grid: Array, pts: Array, valid: Array,
                      pose_map: Array,
                      *,
                      delta_trans: float = 1.5,
                      delta_ang: float = 0.05) -> Array:
    """Sigma-point covariance in MAP coords (OccGridMapUtil.h:249-306)."""
    x, y, a = pose_map[0], pose_map[1], pose_map[2]
    sig = jnp.stack(
        [
            jnp.stack([x + delta_trans, y, a]),
            jnp.stack([x - delta_trans, y, a]),
            jnp.stack([x, y + delta_trans, a]),
            jnp.stack([x, y - delta_trans, a]),
            jnp.stack([x, y, a + delta_ang]),
            jnp.stack([x, y, a - delta_ang]),
            pose_map,
        ]
    )  # [7, 3]
    lh = jax.vmap(lambda p: likelihood_for_state(prob_grid, pts, valid, p))(
        sig
    )  # [7]
    inv_norm = 1.0 / jnp.maximum(jnp.sum(lh), 1e-9)
    mean = jnp.einsum("i,ij->j", lh, sig) * inv_norm
    d = sig - mean
    return jnp.einsum("i,ij,ik->jk", lh * inv_norm, d, d)


def covariance_to_world(cov_map: Array, resolution: float) -> Array:
    """Scale a map-coordinate covariance to world meters
    (OccGridMapUtil.h:312-341): xy block by res^2, theta rows by res."""
    s = jnp.asarray(
        [
            [resolution**2, resolution**2, resolution],
            [resolution**2, resolution**2, resolution],
            [resolution, resolution, 1.0],
        ],
        cov_map.dtype,
    )
    return cov_map * s
