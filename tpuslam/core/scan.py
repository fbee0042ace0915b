"""Fixed-shape laser-scan containers.

The reference streams ROS ``sensor_msgs/LaserScan`` messages and converts them
per-node into PCL clouds / CSM LDP / hector DataContainers
(reference: lesson2/src/scan_to_pointclod2_converter.cc:52-81,
lesson3/src/plicp_odometry.cc:285-322, lesson4 hector_slam.cc:320-362).
On TPU everything is a fixed-size array with a validity mask: invalid beams
(NaN/inf, out of [range_min, range_max]) are masked instead of dropped, so
scan batches stay rectangular and jit sees static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class Scan(NamedTuple):
    """A (batch of) laser scan(s) with static beam count.

    ranges: [..., B]  float  — raw range per beam (masked-out beams hold 0)
    angles: [..., B]  float  — beam angle in the sensor frame
    valid:  [..., B]  bool   — beam validity mask
    stamps: [..., B]  float  — per-beam relative time (s) from scan start,
                               used by motion-distortion correction
                               (reference: lidar_undistortion.cc:343-355).
    """

    ranges: Array
    angles: Array
    valid: Array
    stamps: Array

    @property
    def num_beams(self) -> int:
        return self.ranges.shape[-1]


def make_scan(
    ranges,
    angle_min: float,
    angle_increment: float,
    range_min: float = 0.0,
    range_max: float = np.inf,
    time_increment: float = 0.0,
    num_beams: int | None = None,
    dtype=jnp.float32,
) -> Scan:
    """Build a Scan from raw ranges + laser intrinsics, with validity gating.

    Mirrors the reference's per-beam checks: ``!std::isfinite`` skip and
    ``range_min <= r <= range_max`` gating
    (reference: scan_to_pointclod2_converter.cc:52-81,
    plicp_odometry.cc:293-311 which fills invalid beams with 0 for CSM).
    Pads/truncates to ``num_beams`` when given (reference cap
    ``max_scan_count = 1500``, lesson1/src/feature_detection.cc:23).
    """
    r = np.asarray(ranges, dtype=np.float64)
    n = r.shape[-1]
    idx = np.arange(n, dtype=np.float64)
    ang = angle_min + idx * angle_increment
    stamps = idx * time_increment
    finite = np.isfinite(r)
    rr = np.where(finite, r, 0.0)
    valid = finite & (rr >= range_min) & (rr <= range_max) & (rr > 0.0)

    if num_beams is not None:
        if n >= num_beams:
            rr, ang, valid, stamps = (
                a[..., :num_beams] for a in (rr, ang, valid, stamps)
            )
        else:
            pad = num_beams - n
            pw = [(0, 0)] * (r.ndim - 1) + [(0, pad)]
            rr = np.pad(rr, pw)
            ang = np.pad(ang, [(0, pad)], mode="edge")
            valid = np.pad(valid, pw, constant_values=False)
            stamps = np.pad(stamps, [(0, pad)], mode="edge")

    return Scan(
        ranges=jnp.asarray(np.where(valid, rr, 0.0), dtype=dtype),
        angles=jnp.asarray(np.broadcast_to(ang, rr.shape), dtype=dtype),
        valid=jnp.asarray(valid),
        stamps=jnp.asarray(np.broadcast_to(stamps, rr.shape), dtype=dtype),
    )


def scan_to_points(scan: Scan) -> tuple[Array, Array]:
    """Polar → Cartesian (sensor frame). Returns (points [..., B, 2], valid).

    Reference: scan_to_pointclod2_converter.cc:66-72
    ``p.x = r*cos(angle); p.y = r*sin(angle)``; lesson4 hector pre-scales by
    scaleToMap at the same spot (hector_slam.cc:340-346) — here scaling is
    the grid's job (core/grid.py), keeping this kernel pure.
    """
    x = scan.ranges * jnp.cos(scan.angles)
    y = scan.ranges * jnp.sin(scan.angles)
    return jnp.stack([x, y], axis=-1), scan.valid


def clip_ranges(scan: Scan, max_range: float) -> Scan:
    """Invalidate beams beyond ``max_range`` (reference: karto clips ranges to
    the device rangeThreshold, Karto.cpp:138-184; gmapping clamps to
    max_use_range, gmapping.cc:178-183)."""
    valid = scan.valid & (scan.ranges <= max_range)
    return scan._replace(valid=valid, ranges=jnp.where(valid, scan.ranges, 0.0))
