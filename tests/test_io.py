"""Scan-log IO: native codec round-trip, npz, synthesis, checkpointing."""

import numpy as np
import pytest

from tpuslam.io import bag


def make_log(t=5, b=16):
    rng = np.random.default_rng(0)
    return bag.ScanLog(
        ranges=rng.uniform(0.5, 10, (t, b)).astype(np.float32),
        stamps=np.arange(t, dtype=np.float64) * 0.1,
        odom=rng.uniform(-1, 1, (t, 3)).astype(np.float32),
        imu_wz=rng.uniform(-1, 1, t).astype(np.float32),
        angle_min=-1.5,
        angle_increment=0.01,
        range_min=0.1,
        range_max=30.0,
        time_increment=0.0001,
    )


def assert_logs_equal(a, b):
    assert np.allclose(a.ranges, b.ranges)
    assert np.allclose(a.stamps, b.stamps)
    assert np.allclose(a.odom, b.odom)
    assert np.allclose(a.imu_wz, b.imu_wz)
    assert a.angle_min == pytest.approx(b.angle_min)
    assert a.angle_increment == pytest.approx(b.angle_increment)


def test_tslg_roundtrip_native_or_fallback(tmp_path):
    log = make_log()
    p = tmp_path / "x.tslg"
    bag.save_tslg(p, log)
    got = bag.load_tslg(p)
    assert_logs_equal(log, got)


def test_python_fallback_bit_identical(tmp_path):
    # force the pure-python path and compare bytes with whatever save used
    log = make_log()
    p1 = tmp_path / "a.tslg"
    p2 = tmp_path / "b.tslg"
    bag.save_tslg(p1, log)
    lib = bag._LIB
    tried = bag._LIB_TRIED
    bag._LIB, bag._LIB_TRIED = None, True  # disable native
    try:
        bag.save_tslg(p2, log)
        got = bag.load_tslg(p1)  # python reader on (possibly) native bytes
        assert_logs_equal(log, got)
    finally:
        bag._LIB, bag._LIB_TRIED = lib, tried
    assert p1.read_bytes() == p2.read_bytes()


def test_npz_roundtrip(tmp_path):
    log = make_log()
    p = tmp_path / "x.npz"
    bag.save_npz(p, log)
    got = bag.load(p)
    assert_logs_equal(log, got)


def test_synthesize_shapes_and_scan():
    log, true = bag.synthesize(num_scans=12, num_beams=90)
    assert len(log) == 12 and log.num_beams == 90
    assert true.shape == (12, 3)
    sc = log.scan(3)
    assert sc.ranges.shape == (90,)
    batched = log.scans_batched()
    assert batched.ranges.shape == (12, 90)
    # odometry starts at the true start and drifts slowly
    assert np.allclose(log.odom[0], true[0], atol=1e-5)


def test_checkpoint_pytree_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tpuslam.checkpoint import load_pytree, save_pytree
    from tpuslam.core.config import HectorConfig
    from tpuslam.models import hector_slam

    cfg = HectorConfig(map_size=64, map_multi_res_levels=2, num_beams=32,
                       ray_steps=32)
    st = hector_slam.init_state(cfg)
    st = st._replace(pose=jnp.asarray([1.0, 2.0, 0.5]))
    p = tmp_path / "st.npz"
    save_pytree(p, st)
    got = load_pytree(p, hector_slam.init_state(cfg))
    assert np.allclose(np.asarray(got.pose), [1.0, 2.0, 0.5])
    assert got.log_odds[0].shape == st.log_odds[0].shape


def test_checkpoint_structure_manifest_verified(tmp_path):
    """A same-leaf-count but differently-structured template is rejected
    via the stored treedef manifest (not just leaf-count comparison)."""
    import jax.numpy as jnp
    import pytest

    from tpuslam.checkpoint import load_pytree, save_pytree

    p = tmp_path / "st.npz"
    save_pytree(p, {"a": jnp.zeros(3), "b": jnp.ones(2)})
    # same arity, different structure: tuple instead of dict
    with pytest.raises(ValueError, match="manifest"):
        load_pytree(p, (jnp.zeros(3), jnp.ones(2)))
    # same arity, different dict keys
    with pytest.raises(ValueError, match="manifest"):
        load_pytree(p, {"a": jnp.zeros(3), "c": jnp.ones(2)})
    # matching template still loads
    got = load_pytree(p, {"a": jnp.zeros(3), "b": jnp.zeros(2)})
    assert np.allclose(np.asarray(got["b"]), 1.0)


def test_checkpoint_karto_roundtrip(tmp_path):
    from tpuslam.checkpoint import load_karto, save_karto
    from tpuslam.core.config import KartoConfig
    from tpuslam.core.scan import make_scan
    from tpuslam.models.karto import KartoMapper

    cfg = KartoConfig(num_beams=64, use_scan_range=6.0,
                      correlation_search_space_dimension=0.32,
                      correlation_search_space_resolution=0.02,
                      correlation_search_space_smear_deviation=0.04,
                      do_loop_closing=False, scan_buffer_size=8)
    m = KartoMapper(cfg, max_scans=8)
    rng = np.random.default_rng(0)
    for i in range(3):
        sc = make_scan(rng.uniform(1, 5, 64), angle_min=-1.5,
                       angle_increment=0.05, range_min=0.1, range_max=30.0)
        m.process(sc, np.array([0.3 * i, 0.0, 0.0]), time=float(i) * 10000.0)
    p = tmp_path / "karto.npz"
    save_karto(p, m)
    m2 = KartoMapper(cfg, max_scans=8)
    load_karto(p, m2)
    assert len(m2.records) == len(m.records)
    assert np.allclose(m2.poses[:3], m.poses[:3])
    assert m2.edges[0][0] == m.edges[0][0]
    assert m2.running_by_sensor == m.running_by_sensor
    assert m2.last_by_sensor == m.last_by_sensor


def test_rosbag_roundtrip(tmp_path):
    """Write a minimal spec-conformant rosbag (LaserScan + Odometry + Imu),
    read it back, and convert to a ScanLog with interpolated odometry."""
    from tpuslam.io.rosbag import (
        bag_to_scanlog,
        read_bag,
        serialize_imu,
        serialize_laser_scan,
        serialize_odometry,
        write_bag,
    )

    rng = np.random.default_rng(0)
    msgs = []
    nb = 90
    for i in range(5):
        t = 100.0 + 0.1 * i
        ranges = rng.uniform(1.0, 5.0, nb).astype(np.float32)
        ranges[3] = np.inf
        msgs.append(("/scan", "sensor_msgs/LaserScan", t,
                     serialize_laser_scan(t, ranges, -1.57, 0.035,
                                          range_min=0.1, range_max=10.0,
                                          time_increment=1e-4)))
    for i in range(11):
        t = 99.95 + 0.05 * i
        pose = [0.1 * i, 0.02 * i, 0.01 * i]
        msgs.append(("/odom", "nav_msgs/Odometry", t,
                     serialize_odometry(t, pose, angular_z=0.2)))
        msgs.append(("/imu", "sensor_msgs/Imu", t,
                     serialize_imu(t, [0.0, 0.0, 0.3])))

    for comp in ("none", "bz2"):
        p = tmp_path / f"tiny_{comp}.bag"
        write_bag(p, msgs, compression=comp)
        back = read_bag(p)
        assert len(back) == len(msgs)
        log = bag_to_scanlog(p)
        assert len(log) == 5
        assert log.num_beams == nb
        assert np.isinf(log.ranges[0, 3])
        # odometry interpolated to scan stamps: scan 0 at t=100.0 sits
        # between odom samples at 99.95 (pose 0.1*1?) -> exact: x=0.1*1.0
        np.testing.assert_allclose(log.odom[0, 0], 0.1, atol=1e-6)
        np.testing.assert_allclose(log.odom[2, 0], 0.5, atol=1e-5)
        np.testing.assert_allclose(log.imu_wz, 0.3, atol=1e-6)
        assert abs(log.angle_min + 1.57) < 1e-6
        assert abs(log.time_increment - 1e-4) < 1e-9

    # a ScanLog built from a bag feeds the engines like any other log
    sc = log.scan(0)
    assert sc.num_beams == nb


def test_rosbag_rejects_non_bag(tmp_path):
    from tpuslam.io.rosbag import read_bag

    p = tmp_path / "not_a_bag.bag"
    p.write_bytes(b"#ROSBAG V1.2\nxxxx")
    import pytest

    with pytest.raises(ValueError, match="not a rosbag v2.0"):
        read_bag(p)


def test_tslg_preserves_nan_inf_beams(tmp_path):
    """NaN/inf ranges are the documented invalid-beam encoding and must
    round-trip verbatim (regression: save_tslg once rewrote NaN to 0.0)."""
    from tpuslam.io.bag import ScanLog, load_tslg, save_tslg

    r = np.ones((2, 8), np.float32)
    r[0, 1] = np.nan
    r[0, 2] = np.inf
    r[1, 3] = np.nan
    log = ScanLog(
        ranges=r,
        stamps=np.arange(2, dtype=np.float64),
        odom=np.zeros((2, 3), np.float32),
        imu_wz=np.zeros(2, np.float32),
        angle_min=-1.0,
        angle_increment=0.1,
        range_min=0.1,
        range_max=10.0,
    )
    p = tmp_path / "nan.tslg"
    save_tslg(p, log)
    back = load_tslg(p)
    assert np.array_equal(
        np.isnan(back.ranges), np.isnan(r)
    )
    assert np.array_equal(
        np.isposinf(back.ranges), np.isposinf(r)
    )
