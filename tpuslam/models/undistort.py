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

Two rotation modes (``cfg.three_axis``):

- **3-axis** (reference-exact): integrate (wx, wy, wz), build the per-beam
  RPY rotation ``Rz(yaw)·Ry(pitch)·Rx(roll)`` exactly as
  ``pcl::getTransformation`` does (lidar_undistortion.cc:357-394), and
  return 3D points in the first beam's frame,
- **yaw-only** fast path for level platforms (roll/pitch vanish), returning
  2D points.

The deque pruning + AsyncSpinner thread machinery becomes fixed-size sample
arrays with validity masks; ``jnp.interp``'s boundary clamping reproduces
the reference's front/back bracketing fallbacks.
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
    wx: Array  # [K] roll rate (rad/s); zeros when only yaw is sampled
    wy: Array  # [K] pitch rate (rad/s)


def make_imu_buffer(stamps, wz, capacity: int, wx=None, wy=None) -> ImuBuffer:
    import numpy as np

    stamps = np.asarray(stamps, np.float32)
    wz = np.asarray(wz, np.float32)
    k = min(len(stamps), capacity)
    out_t = np.full(capacity, np.inf, np.float32)
    out_v = np.zeros(capacity, bool)
    out_t[:k] = stamps[:k]
    out_v[:k] = True

    def fill(w):
        out = np.zeros(capacity, np.float32)
        if w is not None:
            out[:k] = np.asarray(w, np.float32)[:k]
        return jnp.asarray(out)

    return ImuBuffer(
        jnp.asarray(out_t), fill(wz), jnp.asarray(out_v), fill(wx), fill(wy)
    )


def interp_bracketed(t: Array, xs: Array, ys: Array) -> Array:
    """``jnp.interp`` equivalent without searchsorted/gathers.

    TPU lowers interp's searchsorted + element gathers to latency-bound
    scalar loads (measured 152 ms for a 1024x512-beam undistort batch);
    this formulation brackets each query with a [B, K] comparison matrix
    and selects endpoints by masked reduces — pure VPU work, exact f32
    (no MXU rounding on the absolute timestamps).  Matches np.interp for
    ascending ``xs`` including the boundary clamps."""
    k = xs.shape[0]
    t1d = jnp.reshape(t, (-1,))  # any query shape; restored at the end
    ge = t1d[:, None] >= xs[None, :]
    idx = jnp.clip(jnp.sum(ge, axis=1) - 1, 0, k - 2)
    cols = jnp.arange(k)[None, :]
    oh0 = idx[:, None] == cols
    oh1 = idx[:, None] + 1 == cols
    x0 = jnp.sum(jnp.where(oh0, xs[None, :], 0.0), axis=1)
    x1 = jnp.sum(jnp.where(oh1, xs[None, :], 0.0), axis=1)
    y0 = jnp.sum(jnp.where(oh0, ys[None, :], 0.0), axis=1)
    y1 = jnp.sum(jnp.where(oh1, ys[None, :], 0.0), axis=1)
    w = jnp.clip((t1d - x0) / jnp.maximum(x1 - x0, 1e-12), 0.0, 1.0)
    out = y0 + w * (y1 - y0)
    return out.reshape(jnp.shape(t))


def integrate_gyro(imu: ImuBuffer, t0: Array, rates: Array) -> Array:
    """Cumulative rotation from scan start: rot[k] = sum w*dt from t0
    (lidar_undistortion.cc:213-249).  Samples before t0 contribute 0."""
    dt = jnp.diff(imu.stamps, prepend=imu.stamps[:1])
    dt = jnp.where(imu.valid & (imu.stamps > t0), dt, 0.0)
    dt = jnp.clip(dt, 0.0, 1.0)  # guard inf gaps at the invalid tail
    return jnp.cumsum(rates * dt)


@partial(jax.jit, static_argnames=("cfg",))
def undistorted_scan(
    cfg: UndistortConfig,
    scan: Scan,
    imu: ImuBuffer,
    odom_rel: Array,
    t0: Array | float,
    t1: Array | float,
) -> Scan:
    """Undistort, then re-express the corrected cloud AS a Scan.

    The reference chains lesson5's node in front of the matchers by
    topic (lidar_undistortion.launch: bag -> node -> corrected cloud);
    tpuslam's engines consume Scan containers, and Scan carries per-beam
    angles, so the corrected points map back exactly: range = |p|,
    angle = atan2(y, x) — scan_to_points reproduces the corrected cloud
    bit-for-bit (modulo one f32 polar round-trip).  Planar configs only
    (three_axis produces out-of-plane points a 2D Scan cannot carry)."""
    if cfg.three_axis:
        raise ValueError(
            "undistorted_scan: three_axis clouds are 3D; consume "
            "undistort() points directly"
        )
    pts, valid = undistort(cfg, scan, imu, odom_rel, t0, t1)
    r = jnp.hypot(pts[..., 0], pts[..., 1])
    ang = jnp.arctan2(pts[..., 1], pts[..., 0])
    return Scan(
        ranges=jnp.where(valid, r, 0.0),
        angles=jnp.where(valid, ang, scan.angles),
        valid=valid,
        stamps=scan.stamps,
    )


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
        safe_stamps = jnp.where(imu.valid, imu.stamps, 1e30)

        def rel_rot(rates):
            cum = integrate_gyro(imu, t0, rates)
            return interp_bracketed(t_i, safe_stamps, cum) - interp_bracketed(
                t0, safe_stamps, cum
            )

        yaw_i = rel_rot(imu.wz)
        if cfg.three_axis:
            roll_i = rel_rot(imu.wx)
            pitch_i = rel_rot(imu.wy)
    else:
        ratio_r = (t_i - t0) / jnp.maximum(t1 - t0, 1e-9)
        yaw_i = ratio_r * odom_rel[2]
        if cfg.three_axis:
            roll_i = jnp.zeros_like(yaw_i)
            pitch_i = jnp.zeros_like(yaw_i)

    if cfg.use_odom:
        ratio = jnp.clip((t_i - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        txy_i = ratio[:, None] * odom_rel[:2]
    else:
        txy_i = jnp.zeros_like(pts)

    x, y = pts[:, 0], pts[:, 1]
    if cfg.three_axis:
        # per-beam R = Rz(yaw)·Ry(pitch)·Rx(roll) exactly as
        # pcl::getTransformation composes it (lidar_undistortion.cc:357-394);
        # beam 0 is the identity by construction (integrals start at t0),
        # so p' = T_i [x, y, 0] directly.  Scans are planar (z = 0) but a
        # rolling/pitching platform rotates them out of plane.
        cr, sr = jnp.cos(roll_i), jnp.sin(roll_i)
        cp, sp = jnp.cos(pitch_i), jnp.sin(pitch_i)
        cy, sy = jnp.cos(yaw_i), jnp.sin(yaw_i)
        # the reference transforms the beam as (x, y, 1.0) — see
        # UndistortConfig.pcl_z_quirk; z adds Rz·Ry·Rx's third column
        z = 1.0 if cfg.pcl_z_quirk else 0.0
        # rows of Rz·Ry·Rx applied to (x, y, z)
        out = jnp.stack(
            [
                cy * cp * x + (cy * sp * sr - sy * cr) * y
                + (cy * sp * cr + sy * sr) * z + txy_i[:, 0],
                sy * cp * x + (sy * sp * sr + cy * cr) * y
                + (sy * sp * cr - cy * sr) * z + txy_i[:, 1],
                -sp * x + cp * sr * y + cp * cr * z,
            ],
            axis=-1,
        )
        return out, valid

    # T_i = (txy_i, yaw_i); beam 0 has T_0 = identity (yaw_0 = 0, txy_0 = 0
    # by construction since t_beam0 == t0); p' = (T_0^-1 T_i) p = T_i p
    c, s = jnp.cos(yaw_i), jnp.sin(yaw_i)
    out = jnp.stack(
        [
            c * x - s * y + txy_i[:, 0],
            s * x + c * y + txy_i[:, 1],
        ],
        axis=-1,
    )
    return out, valid
