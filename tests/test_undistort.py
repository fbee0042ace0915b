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
