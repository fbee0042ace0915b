"""Motion-distortion correction: a spinning/translating robot scanning a wall
must reconstruct the wall straight after correction."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core.config import UndistortConfig
from tpuslam.core.scan import make_scan
from tpuslam.io.simulate import cast_rays, rect_room
from tpuslam.models.undistort import ImuBuffer, make_imu_buffer, undistort

CFG = UndistortConfig()


def distorted_scan(omega, vel, n=180, period=0.1):
    """Simulate a scan taken while rotating at omega rad/s and translating at
    vel m/s: each beam is cast from the robot's pose at that beam's time."""
    segs = rect_room(8.0, 6.0)
    angle_min, fov = -np.pi / 2, np.pi
    inc = fov / (n - 1)
    tinc = period / n
    ranges = np.zeros(n)
    for i in range(n):
        t = i * tinc
        yaw = omega * t
        pos = np.asarray(vel) * t
        beam_world = yaw + angle_min + i * inc
        r = cast_rays(segs, pos, np.array([beam_world]), max_range=30.0)
        ranges[i] = r[0]
    sc = make_scan(ranges, angle_min=angle_min, angle_increment=inc,
                   range_min=0.1, range_max=30.0, time_increment=tinc)
    return sc, period


def wall_x_spread(pts, valid):
    """Spread of x among points reconstructing the x=+4 wall."""
    p = np.asarray(pts)[np.asarray(valid)]
    wall = p[(p[:, 0] > 3.0) & (np.abs(p[:, 1]) < 2.0)]
    assert len(wall) > 10
    return wall[:, 0].std(), wall[:, 0].mean()


def test_rotation_correction():
    omega = 2.0  # rad/s — 0.2 rad of distortion over the scan
    sc, period = distorted_scan(omega, [0.0, 0.0])
    # raw points are visibly bent
    from tpuslam.core.scan import scan_to_points

    raw_pts, valid = scan_to_points(sc)
    raw_std, _ = wall_x_spread(raw_pts, valid)

    imu = make_imu_buffer(np.linspace(0, period, 21), np.full(21, omega), 64)
    pts, v = undistort(CFG, sc, imu, jnp.zeros(3), 0.0, period)
    fixed_std, mean_x = wall_x_spread(pts, v)
    assert fixed_std < raw_std / 3.0, (raw_std, fixed_std)
    assert abs(mean_x - 4.0) < 0.05


def test_translation_correction():
    vel = [1.5, 0.0]  # m/s toward the wall
    sc, period = distorted_scan(0.0, vel)
    imu = make_imu_buffer(np.linspace(0, period, 21), np.zeros(21), 64)
    odom_rel = jnp.array([vel[0] * period, vel[1] * period, 0.0])
    pts, v = undistort(CFG, sc, imu, odom_rel, 0.0, period)
    _, mean_x = wall_x_spread(pts, v)
    # corrected points are in the beam-0 frame: wall should sit at 4.0
    assert abs(mean_x - 4.0) < 0.03


def test_no_motion_is_identity():
    sc, period = distorted_scan(0.0, [0.0, 0.0])
    from tpuslam.core.scan import scan_to_points

    raw_pts, valid = scan_to_points(sc)
    imu = make_imu_buffer(np.linspace(0, period, 5), np.zeros(5), 64)
    pts, v = undistort(CFG, sc, imu, jnp.zeros(3), 0.0, period)
    assert np.allclose(np.asarray(pts), np.asarray(raw_pts), atol=1e-5)


def test_combined_motion():
    omega, vel = 1.5, [1.0, 0.3]
    sc, period = distorted_scan(omega, vel)
    imu = make_imu_buffer(np.linspace(0, period, 51), np.full(51, omega), 64)
    odom_rel = jnp.array([vel[0] * period, vel[1] * period, omega * period])
    pts, v = undistort(CFG, sc, imu, odom_rel, 0.0, period)
    std, mean_x = wall_x_spread(pts, v)
    assert std < 0.02 and abs(mean_x - 4.0) < 0.05


def test_use_imu_false_uses_odom_rotation():
    import dataclasses as dc

    omega = 2.0
    sc, period = distorted_scan(omega, [0.0, 0.0])
    cfg = dc.replace(CFG, use_imu=False)
    # rotation comes from the odom relative yaw, linearly interpolated
    imu = make_imu_buffer(np.linspace(0, period, 5), np.zeros(5), 64)
    odom_rel = jnp.array([0.0, 0.0, omega * period])
    pts, v = undistort(cfg, sc, imu, odom_rel, 0.0, period)
    std, mean_x = wall_x_spread(pts, v)
    assert std < 0.03 and abs(mean_x - 4.0) < 0.05


def test_use_odom_false_ignores_translation():
    import dataclasses as dc

    sc, period = distorted_scan(0.0, [1.5, 0.0])
    cfg = dc.replace(CFG, use_odom=False)
    imu = make_imu_buffer(np.linspace(0, period, 5), np.zeros(5), 64)
    odom_rel = jnp.array([1.5 * period, 0.0, 0.0])
    pts, v = undistort(cfg, sc, imu, odom_rel, 0.0, period)
    # translation not corrected: wall stays smeared compared to corrected
    pts2, _ = undistort(CFG, sc, imu, odom_rel, 0.0, period)
    s_raw, _ = wall_x_spread(pts, v)
    s_fix, _ = wall_x_spread(pts2, v)
    assert s_fix < s_raw


def test_three_axis_matches_yaw_only_on_level_platform():
    """With zero roll/pitch rates the 3-axis path must reduce to the
    yaw-only result (plus a zero z column)."""
    import dataclasses

    period = 0.1
    omega = 1.2
    t = np.linspace(0, period, 21)
    imu = make_imu_buffer(t, np.full(21, omega), 64,
                          wx=np.zeros(21), wy=np.zeros(21))
    sc, _ = distorted_scan(omega, [0.0, 0.0])
    cfg2 = UndistortConfig(num_beams=sc.num_beams, use_odom=False)
    cfg3 = dataclasses.replace(cfg2, three_axis=True)
    p2, v2 = undistort(cfg2, sc, imu, np.zeros(3), 0.0, period)
    p3, v3 = undistort(cfg3, sc, imu, np.zeros(3), 0.0, period)
    assert p3.shape == (sc.num_beams, 3)
    np.testing.assert_allclose(np.asarray(p3[:, :2]), np.asarray(p2),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p3[:, 2]), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))


def test_three_axis_corrects_rolling_platform():
    """A platform rolling at a constant rate tips late beams out of plane;
    the yaw-only path cannot model this (z stays 0, xy error grows), the
    3-axis path recovers the out-of-plane component."""
    import dataclasses

    period = 0.1
    roll_rate = 2.0  # rad/s around x
    t = np.linspace(0, period, 41)
    imu = make_imu_buffer(t, np.zeros(41), 64,
                          wx=np.full(41, roll_rate), wy=np.zeros(41))
    sc, _ = distorted_scan(0.0, [0.0, 0.0])
    cfg3 = dataclasses.replace(
        UndistortConfig(num_beams=sc.num_beams, use_odom=False),
        three_axis=True,
    )
    p3, _ = undistort(cfg3, sc, imu, np.zeros(3), 0.0, period)
    p3 = np.asarray(p3)
    # late beams with y != 0 must leave the plane: z = sin(roll)*y
    from tpuslam.core.scan import scan_to_points

    raw, _ = scan_to_points(sc)
    raw = np.asarray(raw)
    stamps = np.asarray(sc.stamps)
    roll = roll_rate * stamps
    np.testing.assert_allclose(p3[:, 2], np.sin(roll) * raw[:, 1], atol=5e-3)
    # and x is untouched by pure roll
    np.testing.assert_allclose(p3[:, 0], raw[:, 0], atol=5e-3)


def test_interp_bracketed_matches_jnp_interp():
    """The gather-free interpolation must match jnp.interp exactly on
    ascending grids, including boundary clamps, scalars, and inf padding."""
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.models.undistort import interp_bracketed

    rng = np.random.default_rng(0)
    xs = np.sort(rng.uniform(0.0, 1.0, 16)).astype(np.float32)
    xs_pad = np.concatenate([xs, np.full(8, 1e30, np.float32)])
    ys = rng.normal(0, 1, 24).astype(np.float32)
    ys[16:] = ys[15]  # padded tail holds the last value (cumsum w/ dt=0)
    t = rng.uniform(-0.2, 1.2, 64).astype(np.float32)
    got = np.asarray(interp_bracketed(jnp.asarray(t), jnp.asarray(xs_pad),
                                      jnp.asarray(ys)))
    want = np.asarray(jnp.interp(jnp.asarray(t), jnp.asarray(xs_pad),
                                 jnp.asarray(ys)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # scalar query
    s = interp_bracketed(jnp.float32(0.5), jnp.asarray(xs_pad),
                         jnp.asarray(ys))
    np.testing.assert_allclose(
        float(s), float(jnp.interp(0.5, xs_pad, ys)), rtol=1e-6)


def test_undistorted_scan_roundtrip():
    """undistorted_scan re-expresses the corrected cloud as a Scan whose
    scan_to_points reproduces undistort()'s points (one f32 polar
    round-trip of slack)."""
    import jax.numpy as jnp
    import numpy as np

    from tpuslam.core.config import UndistortConfig
    from tpuslam.core.scan import make_scan, scan_to_points
    from tpuslam.models.undistort import (
        make_imu_buffer,
        undistort,
        undistorted_scan,
    )

    rng = np.random.default_rng(0)
    nb = 180
    ranges = rng.uniform(0.5, 8.0, nb)
    ranges[::17] = np.nan
    sc = make_scan(ranges, angle_min=-np.pi, angle_increment=2 * np.pi / nb,
                   range_min=0.1, range_max=10.0, time_increment=0.1 / nb)
    imu = make_imu_buffer(np.array([0.0, 0.1]), np.array([1.8, 1.8]), 64)
    rel = jnp.asarray([0.12, -0.03, 0.18], jnp.float32)
    cfg = UndistortConfig()
    want_pts, want_valid = undistort(cfg, sc, imu, rel, 0.0, 0.1)
    sc2 = undistorted_scan(cfg, sc, imu, rel, 0.0, 0.1)
    got_pts, got_valid = scan_to_points(sc2)
    assert np.array_equal(np.asarray(got_valid), np.asarray(want_valid))
    m = np.asarray(want_valid)
    np.testing.assert_allclose(np.asarray(got_pts)[m],
                               np.asarray(want_pts)[m], atol=2e-5)


def test_undistortion_improves_karto_ate_on_spinning_course():
    """The lesson5 -> matcher composition pays off end-to-end: a robot
    sweeping while rotating fast (0.157 rad per 0.1 s scan = beams smear
    ~9 deg across the sweep) maps measurably worse from raw distorted
    scans than from gyro/odom-corrected ones — the reason the reference
    chains lidar_undistortion in front of its matchers."""
    import math

    import jax.numpy as jnp
    import numpy as np

    from tpuslam.core.config import KartoConfig, UndistortConfig
    from tpuslam.core.scan import make_scan
    from tpuslam.io.simulate import simulate_distorted_scan, world_with_boxes
    from tpuslam.models.karto import KartoMapper
    from tpuslam.models.undistort import make_imu_buffer, undistorted_scan

    segs = world_with_boxes()
    nb, period = 180, 0.1
    radius, dth = 1.6, 2 * math.pi / 40  # 0.157 rad per scan
    twist = np.array([radius * dth / period, 0.0, dth / period])
    n_scans = 50
    pose = np.array([radius, 0.0, math.pi / 2])
    scans, trues = [], []
    for _ in range(n_scans):
        trues.append(pose.copy())
        r, amin, ainc, pose = simulate_distorted_scan(
            segs, pose, twist, num_beams=nb, max_range=30.0,
            scan_period=period,
        )
        scans.append(make_scan(r, angle_min=amin, angle_increment=ainc,
                               range_min=0.1, range_max=30.0,
                               time_increment=period / (nb - 1),
                               num_beams=nb))
    trues = np.stack(trues)

    cfg = KartoConfig(
        num_beams=nb, use_scan_range=10.0,
        minimum_travel_distance=0.0, minimum_travel_heading=0.0,
        minimum_time_interval=0.0,
        correlation_search_space_dimension=0.32,
        correlation_search_space_resolution=0.02,
        correlation_search_space_smear_deviation=0.04,
        do_loop_closing=False,
    )
    ucfg = UndistortConfig()

    def run(corrected: bool) -> float:
        mapper = KartoMapper(cfg, max_scans=n_scans + 8)
        for i, sc in enumerate(scans):
            if corrected and i > 0:
                t0, t1 = (i - 1) * period, i * period
                imu = make_imu_buffer(
                    np.array([t0, t1 + period]),
                    np.array([twist[2], twist[2]]), 16,
                )
                rel = np.array([
                    twist[0] * period, twist[1] * period, twist[2] * period,
                ])
                sc = undistorted_scan(ucfg, sc, imu,
                                      jnp.asarray(rel, jnp.float32), t1,
                                      t1 + period)
            mapper.process(sc, trues[i], time=i * period)
        n = len(mapper.records)
        tp = np.asarray(mapper.poses[:n], np.float64)
        return float(np.sqrt(np.mean(
            np.sum((tp[:, :2] - trues[:n, :2]) ** 2, 1))))

    ate_raw = run(False)
    ate_fix = run(True)
    # corrected scans must land measurably closer to truth (the absolute
    # floor is set by the 2 cm search lattice + the model's linear
    # translation interpolation, not by the rotation correction)
    assert ate_fix < 0.6 * ate_raw, (ate_raw, ate_fix)
    assert ate_fix < 0.08, (ate_raw, ate_fix)
