"""CLI smoke tests: every workload runs on a synthetic log and emits JSON."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def run_cli(*args):
    env = dict(os.environ, TPUSLAM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "tpuslam.cli", *args],
        capture_output=True, text=True, timeout=1200, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_synth_and_load(tmp_path):
    p = tmp_path / "log.tslg"
    r = run_cli("synth", "--out", str(p), "--num-scans", "8",
                "--num-beams", "64", "--synthetic")
    assert r["scans"] == 8 and r["beams"] == 64
    from tpuslam.io import bag

    log = bag.load(p)
    assert len(log) == 8


def test_features_cmd():
    r = run_cli("features", "--synthetic", "--num-scans", "4",
                "--num-beams", "120")
    assert r["workload"] == "features" and r["mean_corners"] >= 0


def test_icp_cmd():
    r = run_cli("scan-match-icp", "--synthetic", "--num-scans", "4",
                "--num-beams", "180")
    assert r["workload"] == "scan_match_icp"


def test_plicp_cmd(tmp_path):
    save = tmp_path / "out.npz"
    r = run_cli("plicp-odometry", "--synthetic", "--num-scans", "10",
                "--num-beams", "180", "--save", str(save))
    assert r["ate_rmse"] is not None and r["ate_rmse"] < 0.1
    assert np.load(save)["poses"].shape == (10, 3)


def test_occupancy_cmd():
    r = run_cli("occupancy-map", "--synthetic", "--num-scans", "6",
                "--num-beams", "180")
    assert r["occupied_cells"] > 0 and r["free_cells"] > 0


def test_hector_cmd(tmp_path):
    save = tmp_path / "h.npz"
    # hector has no motion prediction: needs dense scan-to-scan motion
    r = run_cli("hector", "--synthetic", "--num-scans", "12",
                "--num-beams", "240", "--poses-per-rev", "120",
                "--save", str(save))
    assert r["ate_rmse"] < 0.1, r
    z = np.load(save)
    assert z["map"].ndim == 2 and z["poses"].shape == (12, 3)


def test_undistort_cmd():
    r = run_cli("undistort", "--synthetic", "--num-scans", "4",
                "--num-beams", "90")
    assert r["scans"] == 3


@pytest.mark.slow
def test_karto_cmd():
    r = run_cli("karto", "--synthetic", "--num-scans", "20",
                "--num-beams", "180")
    assert r["scans_processed"] > 5
    assert r["ate_rmse"] is not None and r["ate_rmse"] < 0.15


def test_karto_laser_mount(tmp_path):
    """--laser-mount wires the FrameTree into the karto workload: an
    upright origin mount is a no-op, and a log recorded by an
    upside-down laser (range arrays reversed, karto_slam.cc:417-425) is
    restored by declaring the inverted extrinsic."""
    r_plain = run_cli("karto", "--synthetic", "--num-scans", "12",
                      "--num-beams", "180", "--seed", "3")
    # upright mount at the base origin == no mount at all
    r_id = run_cli("karto", "--synthetic", "--num-scans", "12",
                   "--num-beams", "180", "--seed", "3",
                   "--laser-mount", "0,0,0.3,0,0,0")
    assert r_id["scans_processed"] == r_plain["scans_processed"]
    assert abs(r_id["ate_rmse"] - r_plain["ate_rmse"]) < 1e-9

    # record the same world with an INVERTED laser: reversed range arrays
    import dataclasses

    from tpuslam.io import bag

    log, true = bag.synthesize(num_scans=12, num_beams=180, seed=3,
                               poses_per_rev=40)
    inv_log = dataclasses.replace(log, ranges=log.ranges[:, ::-1].copy())
    p = tmp_path / "inv.npz"
    bag.save_npz(p, inv_log)
    save = tmp_path / "poses.npz"
    run_cli("karto", "--log", str(p), "--save", str(save),
            "--laser-mount", "0,0,0.3,3.14159265358979,0,0")
    poses = np.load(save)["poses"]
    n = poses.shape[0]
    assert n == r_plain["scans_processed"]
    # the mount restores the geometry: trajectory tracks the truth (the
    # asymmetric angular grid leaves a <= 1-beam residual rotation)
    ate = np.sqrt(((poses[:, :2] - true[:n, :2]) ** 2).sum(1)).mean()
    assert ate < 0.2, ate


def test_scan_info_cmd():
    r = run_cli("scan-info", "--synthetic", "--num-scans", "5",
                "--num-beams", "90")
    assert r["workload"] == "scan_info"
    assert r["scans"] == 5 and r["num_beams"] == 90
    assert r["mean_valid_beams"] > 0 and r["mean_range"] > 0


def test_pointcloud_cmd(tmp_path):
    save = tmp_path / "pc.npz"
    r = run_cli("pointcloud", "--synthetic", "--num-scans", "3",
                "--num-beams", "60", "--save", str(save))
    assert r["mean_valid"] > 0
    z = np.load(save)
    assert z["points"].shape == (3, 60, 2)


def test_hector_png(tmp_path):
    png = tmp_path / "m.png"
    run_cli("hector", "--synthetic", "--num-scans", "6", "--num-beams", "180",
            "--poses-per-rev", "120", "--png", str(png))
    assert png.exists() and png.stat().st_size > 5000


def test_karto_with_yaml_config(tmp_path):
    cfgfile = tmp_path / "mapper.yaml"
    cfgfile.write_text(
        "use_scan_range: 6.0\n"
        "minimum_travel_distance: 0.2\n"
        "scan_buffer_size: 10\n"
        "correlation_search_space_dimension: 0.32\n"
        "correlation_search_space_resolution: 0.02\n"
        "correlation_search_space_smear_deviation: 0.04\n"
        "do_loop_closing: false\n"
    )
    r = run_cli("karto", "--synthetic", "--num-scans", "8",
                "--num-beams", "120", "--config", str(cfgfile))
    assert r["scans_processed"] >= 3
    assert r["ate_rmse"] is not None


def test_karto_tf_only_bag(tmp_path):
    """VERDICT r4 #1 'done' criterion: a fixture bag carrying odometry
    ONLY via /tf (written by the independent ros_comm-layout writer)
    replays through ``cli.py karto`` with the same trajectory as the
    /odom-topic path, and an inverted-laser /tf_static extrinsic resolves
    through the registry with no --laser-mount flag."""
    import math

    import test_rosbag_real as trr

    from tpuslam.io import bag

    log, true = bag.synthesize(num_scans=12, num_beams=180, seed=3,
                               poses_per_rev=40)
    ident = [("base_link", "laser_frame", (0.0, 0.0, 0.2),
              (0.0, 0.0, 0.0, 1.0))]
    pa = tmp_path / "odom_topic.bag"
    trr.write_roscomm_style_bag(pa, trr._tf_bag_messages(
        log.stamps, log.odom, log.ranges, with_odom_topic=True,
        angle_min=log.angle_min, inc=log.angle_increment,
        rmin=log.range_min, rmax=log.range_max))
    pb = tmp_path / "tf_only.bag"
    trr.write_roscomm_style_bag(pb, trr._tf_bag_messages(
        log.stamps, log.odom, log.ranges, with_odom_topic=False,
        static_tfs=ident, angle_min=log.angle_min,
        inc=log.angle_increment, rmin=log.range_min, rmax=log.range_max))

    sa, sb = tmp_path / "a.npz", tmp_path / "b.npz"
    ra = run_cli("karto", "--log", str(pa), "--save", str(sa))
    rb = run_cli("karto", "--log", str(pb), "--save", str(sb))
    assert rb["scans_processed"] == ra["scans_processed"] > 0
    np.testing.assert_allclose(np.load(sb)["poses"], np.load(sa)["poses"],
                               atol=1e-5)

    # inverted laser declared ONLY in /tf_static: ranges recorded reversed,
    # the registry (built from the bag's frame tree) restores the geometry
    pc = tmp_path / "tf_inverted.bag"
    trr.write_roscomm_style_bag(pc, trr._tf_bag_messages(
        log.stamps, log.odom, log.ranges[:, ::-1].copy(),
        with_odom_topic=False,
        static_tfs=[("base_link", "laser_frame", (0.0, 0.0, 0.3),
                     trr._quat_roll(math.pi))],
        angle_min=log.angle_min, inc=log.angle_increment,
        rmin=log.range_min, rmax=log.range_max))
    sc = tmp_path / "c.npz"
    run_cli("karto", "--log", str(pc), "--save", str(sc))
    poses = np.load(sc)["poses"]
    n = poses.shape[0]
    assert n == ra["scans_processed"]
    ate = np.sqrt(((poses[:, :2] - true[:n, :2]) ** 2).sum(1)).mean()
    assert ate < 0.2, ate


def test_karto_undistort_improves_ate():
    """lesson5 composed into the SLAM workload: on a motion-distorted
    synthetic log (--distorted casts each beam from the pose actually
    swept during acquisition), `karto --undistort` runs the gyro/odom
    correction in front of the matcher — the reference's node chain,
    lidar_undistortion.launch — and lands measurably closer to truth."""
    common = ("--synthetic", "--distorted", "--num-scans", "24",
              "--num-beams", "180", "--poses-per-rev", "30")
    raw = run_cli("karto", *common)
    fix = run_cli("karto", *common, "--undistort")
    assert raw["scans_processed"] > 5 and fix["scans_processed"] > 5
    assert fix["ate_rmse"] < raw["ate_rmse"], (raw, fix)
    assert fix["ate_rmse"] < 0.08, fix


def test_hector_undistort_cmd():
    """`hector --undistort` runs end-to-end on a distorted log and stays
    inside its tracking envelope."""
    r = run_cli("hector", "--synthetic", "--distorted", "--undistort",
                "--num-scans", "10", "--num-beams", "240",
                "--poses-per-rev", "120")
    assert r["ate_rmse"] < 0.12, r
