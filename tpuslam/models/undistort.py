"""IMU + wheel-odometry motion-distortion correction (lesson5).

Behavioral contract (reference: lesson5/src/lidar_undistortion.cc):

- gyro rates are integrated into a cumulative rotation over the scan span
  (``imu_rot_*[k] = imu_rot_*[k-1] + omega * dt``, 177-249),
- odometry start/end poses give the scan-period translation
  ``transBt = transBegin^-1 · transEnd`` (252-336),
- each beam i at time ``t_i = t0 + i*time_increment`` gets its rotation by
  linear interpolation between bracketing IMU samples (398-432) and its
  translation by the linear time ratio (435-447),
- the corrected point is re-expressed in the FIRST beam's frame via
  ``p' = (T_start^-1 · T_i) p`` (339-394).

The reference integrates 3-axis gyro and applies a 3D rotation; this 2D
framework integrates the yaw rate (the component that matters for planar
scans) — the roll/pitch terms vanish for a level 2D platform.  The deque
pruning + AsyncSpinner thread machinery becomes fixed-size sample arrays
with validity masks; ``jnp.interp``'s boundary clamping reproduces the
reference's front/back bracketing fallbacks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core.config import UndistortConfig
from tpuslam.core.scan import Scan, scan_to_points

Array = jax.Array


class ImuBuffer(NamedTuple):
    """Fixed-capacity gyro sample buffer (the reference's imu deque)."""

    stamps: Array  # [K] sample times (s), ascending; invalid = +inf
    wz: Array  # [K] yaw rate (rad/s)
    valid: Array  # [K]


def make_imu_buffer(stamps, wz, capacity: int) -> ImuBuffer:
    import numpy as np

    stamps = np.asarray(stamps, np.float32)
    wz = np.asarray(wz, np.float32)
    k = min(len(stamps), capacity)
    out_t = np.full(capacity, np.inf, np.float32)
    out_w = np.zeros(capacity, np.float32)
    out_v = np.zeros(capacity, bool)
    out_t[:k] = stamps[:k]
    out_w[:k] = wz[:k]
    out_v[:k] = True
    return ImuBuffer(jnp.asarray(out_t), jnp.asarray(out_w), jnp.asarray(out_v))


def integrate_gyro(imu: ImuBuffer, t0: Array) -> Array:
    """Cumulative yaw from scan start: rot[k] = sum w*dt from t0
    (lidar_undistortion.cc:213-249).  Samples before t0 contribute 0."""
    dt = jnp.diff(imu.stamps, prepend=imu.stamps[:1])
    dt = jnp.where(imu.valid & (imu.stamps > t0), dt, 0.0)
    dt = jnp.clip(dt, 0.0, 1.0)  # guard inf gaps at the invalid tail
    return jnp.cumsum(imu.wz * dt)


@partial(jax.jit, static_argnames=("cfg",))
def undistort(
    cfg: UndistortConfig,
    scan: Scan,
    imu: ImuBuffer,
    odom_rel: Array,  # [3] transBt: base motion over [t0, t1] (odom frame)
    t0: Array | float,
    t1: Array | float,
) -> tuple[Array, Array]:
    """Correct one scan; returns (points [B, 2] in beam-0 frame, valid [B])."""
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    pts, valid = scan_to_points(scan)
    t_i = t0 + scan.stamps

    if cfg.use_imu:
        rot_cum = integrate_gyro(imu, t0)
        safe_stamps = jnp.where(imu.valid, imu.stamps, 1e30)
        rot_i = jnp.interp(t_i, safe_stamps, rot_cum)
        rot_0 = jnp.interp(t0, safe_stamps, rot_cum)
        yaw_i = rot_i - rot_0
    else:
        ratio_r = (t_i - t0) / jnp.maximum(t1 - t0, 1e-9)
        yaw_i = ratio_r * odom_rel[2]

    if cfg.use_odom:
        ratio = jnp.clip((t_i - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        txy_i = ratio[:, None] * odom_rel[:2]
    else:
        txy_i = jnp.zeros_like(pts)

    # T_i = (txy_i, yaw_i); beam 0 has T_0 = identity (yaw_0 = 0, txy_0 = 0
    # by construction since t_beam0 == t0); p' = (T_0^-1 T_i) p = T_i p
    t_pose = jnp.concatenate([txy_i, yaw_i[:, None]], axis=-1)  # [B, 3]
    c, s = jnp.cos(t_pose[:, 2]), jnp.sin(t_pose[:, 2])
    x, y = pts[:, 0], pts[:, 1]
    out = jnp.stack(
        [
            c * x - s * y + t_pose[:, 0],
            s * x + c * y + t_pose[:, 1],
        ],
        axis=-1,
    )
    return out, valid
