"""tpuslam command line: the six lesson workloads as subcommands.

Replaces the reference's roslaunch entry points (SURVEY.md §1 L5 layer:
lesson*/launch/*.launch + rosbag playback) with ``python -m tpuslam.cli``:

    synth            generate a synthetic scan log (.tslg / .npz)
    scan-info        lesson1: scan stream metadata/statistics
    features         lesson1: curvature corner extraction
    pointcloud       lesson2: scan→point-cloud conversion dump
    scan-match-icp   lesson2: frame-to-frame ICP
    plicp-odometry   lesson3: PL-ICP keyframe odometry
    occupancy-map    lesson4: gmapping-style hit/visit map from posed scans
    hector           lesson4: hector SLAM (--png renders map+trajectory)
    undistort        lesson5: IMU/odom motion-distortion correction
    karto            lesson6: correlative frontend + loop closure + solver

Every workload runs from a scan log (``--log``) or a synthesized one
(``--synthetic``), prints a JSON result line, and can save outputs with
``--save out.npz``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

if os.environ.get("TPUSLAM_PLATFORM"):
    # Honor an explicit platform request (e.g. tests forcing CPU) before any
    # backend initialization; plain JAX_PLATFORMS can be pre-set by site
    # startup hooks in TPU pods, so route through jax.config.
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["TPUSLAM_PLATFORM"])

if os.environ.get("TPUSLAM_NO_COMPILE_CACHE") != "1":
    # Persistent XLA compilation cache: the karto pipeline compiles a family
    # of matcher/solver shapes as the pose graph grows — caching them across
    # runs turns minutes of first-run compiles into warm starts.
    import jax as _jax2

    _jax2.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "TPUSLAM_COMPILE_CACHE",
            os.path.expanduser("~/.cache/tpuslam-xla"),
        ),
    )
    _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--log",
        help="scan log path (.tslg, .npz, or a ROS1 .bag — chunk "
        "compression none/bz2/lz4)",
    )
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic log instead of --log")
    p.add_argument("--distorted", action="store_true",
                   help="with --synthetic: simulate rolling-shutter motion "
                   "distortion (beams cast from the poses swept during "
                   "acquisition) — the effect --undistort corrects")
    p.add_argument("--num-scans", type=int, default=60)
    p.add_argument("--poses-per-rev", type=int, default=40,
                   help="synthetic circle density (scan-to-scan motion)")
    p.add_argument("--num-beams", type=int, default=360)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save", help="write outputs (npz)")
    p.add_argument("--png", help="render map/trajectory PNG (rviz analog)")
    p.add_argument("--map-stream", type=float, metavar="SECONDS",
                   help="publish map_update events every SECONDS of scan "
                   "time (reference: map_update_interval 5s / "
                   "map_pub_period 2s); summaries log to stderr")
    p.add_argument("--config", help="YAML config with reference parameter "
                   "names (core.config.from_yaml)")
    p.add_argument("--report", action="store_true",
                   help="print per-stage timing report to stderr")
    p.add_argument("--laser-mount", metavar="X,Y,Z,ROLL,PITCH,YAW",
                   help="static base_link->laser extrinsic (the reference "
                   "looks this up from TF, karto_slam.cc:327-405 / "
                   "plicp_odometry.cc:257-280); upside-down mounts "
                   "(|roll| ~ pi) are auto-detected and their range arrays "
                   "reversed, karto_slam.cc:417-425")
    p.add_argument("--undistort", action="store_true",
                   help="run lesson5's gyro/odometry motion correction on "
                   "every scan before matching — the reference's node "
                   "chain, lidar_undistortion.launch feeding the matcher "
                   "(lidar_undistortion.cc:339-447); needs per-beam "
                   "stamps (a log with time_increment > 0) to have any "
                   "effect")


def _laser_registry(args, log=None):
    """Build the FrameTree/LaserRegistry for --laser-mount (or None).

    Returns (registry, frame_name); the caller composes sensor poses via
    ``registry.sensor_pose`` and stages ranges via ``stage_ranges`` —
    the two static jobs the reference delegates to ROS TF.  When no
    --laser-mount is given but the log came from a rosbag carrying
    /tf_static, the extrinsic resolves from the bag's own frame tree
    (io/rosbag.py TfBuffer), exactly as SlamKarto::getLaser looks it up
    (karto_slam.cc:327-405)."""
    from tpuslam.core.frames import FrameTree, LaserRegistry, Transform3

    if getattr(args, "laser_mount", None):
        vals = [float(x) for x in args.laser_mount.split(",")]
        if len(vals) != 6:
            raise SystemExit("--laser-mount needs 6 comma-separated values")
        ft = FrameTree("base_link")
        ft.add("base_link", "laser", Transform3.from_xyz_rpy(*vals))
        return LaserRegistry(ft), "laser"
    frames = getattr(log, "frames", None)
    laser_frame = getattr(log, "laser_frame", None)
    if frames is not None and laser_frame and laser_frame != frames.root:
        return LaserRegistry(frames), laser_frame
    return None, None


def _make_undistorter(args, log):
    """Per-scan motion corrector for --undistort (or None).

    Returns ``fn(i, scan) -> Scan`` applying lesson5's correction with
    the log's own gyro + odometry, chained in front of the matcher as
    the reference's launch graph chains the node
    (lidar_undistortion.launch).  Scan i's beams sweep forward from its
    stamp — beam-0 frame = the pose at stamps[i] — so the motion bracket
    is [stamps[i], stamps[i+1]] (offline replay has the next sample; the
    reference node equivalently buffers until TF covers the sweep,
    lidar_undistortion.cc:250-312).  The last scan passes through
    uncorrected."""
    if not getattr(args, "undistort", False):
        return None
    import jax.numpy as jnp

    from tpuslam.core.config import UndistortConfig
    from tpuslam.models.undistort import make_imu_buffer, undistorted_scan

    cfg = UndistortConfig()

    def fn(i, scan):
        if i + 1 >= len(log):
            return scan  # no bracketing sample after the final scan
        t0, t1 = float(log.stamps[i]), float(log.stamps[i + 1])
        imu = make_imu_buffer(
            np.array([t0, t1]), np.array([log.imu_wz[i + 1]] * 2), 64
        )
        a, b = log.odom[i], log.odom[i + 1]
        ca, sa = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        rel = np.array([
            ca * d[0] + sa * d[1],
            -sa * d[0] + ca * d[1],
            np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2])),
        ])
        return undistorted_scan(
            cfg, scan, imu, jnp.asarray(rel, jnp.float32), t0, t1
        )

    return fn


def _get_log(args):
    from tpuslam.io import bag

    if args.log:
        return bag.load(args.log), None
    log, true = bag.synthesize(
        num_scans=args.num_scans, num_beams=args.num_beams, seed=args.seed,
        poses_per_rev=args.poses_per_rev,
        distorted=getattr(args, "distorted", False),
    )
    return log, true


def _ate(poses: np.ndarray, true: np.ndarray | None):
    if true is None:
        return None
    n = min(len(poses), len(true))
    return float(
        np.sqrt(((poses[:n, :2] - true[:n, :2]) ** 2).sum(1)).mean()
    )


def _emit(payload: dict, save: str | None, arrays: dict | None = None):
    print(json.dumps(payload))
    if save and arrays:
        np.savez_compressed(save, **arrays)


def cmd_synth(args):
    from tpuslam.io import bag

    log, true = bag.synthesize(
        num_scans=args.num_scans, num_beams=args.num_beams, seed=args.seed,
        poses_per_rev=args.poses_per_rev,
    )
    out = args.out
    if out.endswith(".npz"):
        bag.save_npz(out, log)
    else:
        bag.save_tslg(out, log)
    np.savez_compressed(out + ".truth.npz", true=true)
    print(json.dumps({"written": out, "scans": len(log),
                      "beams": log.num_beams}))


def cmd_scan_info(args):
    """Lesson1 laser_scan_node parity: print scan metadata + per-scan stats
    (reference: lesson1/src/laser_scan_node.cc:49-74 prints angle range,
    increments, counts, and sampled ranges)."""
    log, _ = _get_log(args)
    finite = np.isfinite(log.ranges) & (log.ranges > 0)
    _emit(
        {
            "workload": "scan_info",
            "scans": len(log),
            "num_beams": log.num_beams,
            "angle_min": log.angle_min,
            "angle_increment": log.angle_increment,
            "range_min": log.range_min,
            "range_max": log.range_max,
            "time_increment": log.time_increment,
            "mean_valid_beams": float(finite.sum(1).mean()),
            "mean_range": float(log.ranges[finite].mean()),
            "duration_s": float(log.stamps[-1] - log.stamps[0]),
        },
        args.save,
    )


def cmd_pointcloud(args):
    """Lesson2 scan→cloud converter parity (scan_to_pointclod2_converter.cc:
    52-81): polar→cartesian with validity gating, dumped as npz."""
    from tpuslam.core.scan import scan_to_points

    log, _ = _get_log(args)
    pts_all, valid_all = [], []
    for i in range(len(log)):
        pts, valid = scan_to_points(log.scan(i))
        pts_all.append(np.asarray(pts))
        valid_all.append(np.asarray(valid))
    _emit(
        {"workload": "pointcloud", "scans": len(log),
         "mean_valid": float(np.stack(valid_all).sum(1).mean())},
        args.save,
        {"points": np.stack(pts_all), "valid": np.stack(valid_all)},
    )


def cmd_features(args):
    from tpuslam.core.config import FeatureConfig
    from tpuslam.ops.features import extract_features

    log, _ = _get_log(args)
    cfg = FeatureConfig()
    counts = []
    masks = []
    for i in range(len(log)):
        f = extract_features(cfg, log.scan(i))
        m = np.asarray(f.corner_mask)
        counts.append(int(m.sum()))
        masks.append(m)
    _emit(
        {"workload": "features", "scans": len(log),
         "mean_corners": float(np.mean(counts))},
        args.save,
        {"corner_masks": np.stack(masks)},
    )


def cmd_icp(args):
    from tpuslam.core.config import IcpConfig
    from tpuslam.models import scan_match_icp

    log, _ = _get_log(args)
    cfg = IcpConfig(num_beams=log.num_beams, max_iterations=20)
    st = scan_match_icp.init_state(cfg)
    out = []
    for i in range(len(log)):
        st, res = scan_match_icp.step(cfg, st, log.scan(i))
        out.append(np.asarray(res.pose))
    out = np.stack(out)
    _emit(
        {"workload": "scan_match_icp", "frames": len(log),
         "mean_step_norm": float(np.linalg.norm(out[1:, :2], axis=1).mean())},
        args.save,
        {"transforms": out},
    )


def cmd_plicp(args):
    from tpuslam.core import se2
    import jax.numpy as jnp

    from tpuslam.core.config import PlicpConfig
    from tpuslam.models import plicp_odometry
    from tpuslam.utils.timing import StepTimer

    log, true = _get_log(args)
    cfg = PlicpConfig(num_beams=log.num_beams)
    st = plicp_odometry.init_state(cfg)
    # --laser-mount: the model consumes the planar base->laser extrinsic
    # directly (plicp_odometry.cc:257-280 TF chain); inverted mounts also
    # reverse the range arrays at staging (karto_slam.cc:417-425)
    registry, laser_frame = _laser_registry(args, log)
    b2l = None
    if registry is not None:
        import jax.numpy as _jnp

        b2l = _jnp.asarray(
            registry.get(laser_frame).offset_pose, _jnp.float32
        )

    def _scan(i):
        if registry is None:
            return log.scan(i)
        from tpuslam.core.scan import make_scan

        return make_scan(
            registry.stage_ranges(laser_frame, log.ranges[i]),
            angle_min=log.angle_min, angle_increment=log.angle_increment,
            range_min=log.range_min, range_max=log.range_max,
            time_increment=log.time_increment, num_beams=log.num_beams,
        )

    timer = StepTimer()
    poses = []
    dts = np.diff(log.stamps, prepend=log.stamps[0] - 0.1)
    for i in range(len(log)):
        with timer.stage("plicp_step"):
            st, info = plicp_odometry.step(cfg, st, _scan(i),
                                           dt=float(dts[i]),
                                           base_to_laser=b2l)
        poses.append(np.asarray(info.pose))
    poses = np.stack(poses)
    # odometry is relative to the first pose's frame
    rel_true = None
    if true is not None:
        t0 = jnp.asarray(true[0], jnp.float32)
        rel_true = np.stack(
            [np.asarray(se2.relative(t0, jnp.asarray(p, jnp.float32)))
             for p in true]
        )
    if args.report:
        print(timer.report(), file=sys.stderr)
    _emit(
        {"workload": "plicp_odometry", "scans": len(log),
         "ate_rmse": _ate(poses, rel_true)},
        args.save,
        {"poses": poses},
    )


def cmd_occupancy(args):
    import jax.numpy as jnp

    from tpuslam.core.config import GmappingConfig
    from tpuslam.models import gmapping
    from tpuslam.ops.counts import gmapping_export

    log, true = _get_log(args)
    poses = true if true is not None else log.odom
    span = float(np.abs(poses[:, :2]).max()) + log.range_max / 2 + 1
    cfg = GmappingConfig(
        xmin=-span, ymin=-span, xmax=span, ymax=span, delta=0.05,
        num_beams=log.num_beams,
        ray_steps=int(log.range_max / 0.05) + 8,
    )
    counts = gmapping.map_from_scans(
        cfg, jnp.asarray(poses, jnp.float32), log.scans_batched()
    )
    img = np.asarray(gmapping_export(counts, cfg.occ_thresh))
    _emit(
        {"workload": "occupancy_map", "scans": len(log),
         "occupied_cells": int((img == 100).sum()),
         "free_cells": int((img == 0).sum())},
        args.save,
        {"map": img},
    )


def _make_map_publisher(period, exporter):
    """MapPublisher wired to a stderr JSON sink (image elided from logs)."""
    from tpuslam.utils.events import EventBus
    from tpuslam.utils.map_server import MapPublisher

    bus = EventBus()

    def _sink(event, payload):
        rec = {k: (list(v) if isinstance(v, tuple) else v)
               for k, v in payload.items() if k != "image"}
        print(json.dumps({"event": event, **rec}), file=sys.stderr)

    bus.subscribe(_sink)
    return MapPublisher(bus, exporter, period=period)


def cmd_hector(args):
    import jax.numpy as jnp

    from tpuslam.core.config import HectorConfig
    from tpuslam.models import hector_slam
    from tpuslam.utils.timing import StepTimer

    log, true = _get_log(args)
    if args.config:
        from tpuslam.core.config import from_yaml

        cfg = dataclasses.replace(from_yaml("hector", args.config),
                                  num_beams=log.num_beams)
    else:
        cfg = HectorConfig(
            map_size=512, num_beams=log.num_beams,
            laser_max_dist=min(log.range_max, 25.0),
            ray_steps=512,
            map_update_distance_thresh=0.1, map_update_angle_thresh=0.15,
        )
    undis = _make_undistorter(args, log)
    scan0 = log.scan(0) if undis is None else undis(0, log.scan(0))
    st = hector_slam.init_state(cfg)
    if true is not None:
        st = st._replace(pose=jnp.asarray(true[0], jnp.float32))
    st, _ = hector_slam.step(cfg, st, scan0, map_without_matching=True)
    timer = StepTimer()
    pub = None
    if getattr(args, "map_stream", None) is not None:
        # hector's map_pub_period publish thread analog
        # (hector_slam.cc:86, 253-317)
        pub = _make_map_publisher(
            args.map_stream, lambda: np.asarray(hector_slam.occupancy_image(st))
        )
    poses = [np.asarray(st.pose)]
    for i in range(1, len(log)):
        scan_i = log.scan(i) if undis is None else undis(i, log.scan(i))
        with timer.stage("hector_step"):
            st, res = hector_slam.step(cfg, st, scan_i)
        poses.append(np.asarray(st.pose))
        if pub is not None:
            pub.maybe_publish(float(log.stamps[i]))
    poses = np.stack(poses)
    if args.report:
        print(timer.report(), file=sys.stderr)
    img = np.asarray(hector_slam.occupancy_image(st))
    if args.png:
        from tpuslam.models.hector_slam import make_specs
        from tpuslam.utils.viz import render_map

        spec = make_specs(cfg)[0]
        render_map(args.png, img, resolution=spec.resolution,
                   origin=(spec.origin_x, spec.origin_y), trajectory=poses,
                   title="hector")
    _emit(
        {"workload": "hector", "scans": len(log),
         "ate_rmse": _ate(poses, true),
         "map_updates": int(st.num_updates)},
        args.save,
        {"poses": poses, "map": img},
    )


def cmd_undistort(args):
    import jax.numpy as jnp

    from tpuslam.core.config import UndistortConfig
    from tpuslam.models.undistort import make_imu_buffer, undistort

    log, _ = _get_log(args)
    cfg = UndistortConfig()
    pts_all = []
    # scan i sweeps forward from its stamp (beam-0 frame = pose at
    # stamps[i]); the bracket is [stamps[i], stamps[i+1]] — the same
    # convention _make_undistorter uses when chaining into a matcher
    for i in range(len(log) - 1):
        t0, t1 = float(log.stamps[i]), float(log.stamps[i + 1])
        imu = make_imu_buffer(
            np.array([t0, t1]), np.array([log.imu_wz[i + 1]] * 2), 64
        )
        # odom relative motion over the scan period
        a, b = log.odom[i], log.odom[i + 1]
        ca, sa = np.cos(a[2]), np.sin(a[2])
        d = b[:2] - a[:2]
        rel = np.array([ca * d[0] + sa * d[1], -sa * d[0] + ca * d[1],
                        np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2]))])
        pts, v = undistort(cfg, log.scan(i), imu,
                           jnp.asarray(rel, jnp.float32), t0, t1)
        pts_all.append(np.asarray(pts))
    _emit(
        {"workload": "undistort", "scans": len(log) - 1,
         "num_beams": log.num_beams},
        args.save,
        {"points": np.stack(pts_all)},
    )


def cmd_karto(args):
    from tpuslam.core.config import KartoConfig
    from tpuslam.models.karto import KartoMapper
    from tpuslam.utils.timing import StepTimer

    log, true = _get_log(args)
    if args.config:
        from tpuslam.core.config import from_yaml

        cfg = dataclasses.replace(from_yaml("karto", args.config),
                                  num_beams=log.num_beams)
        mapper = KartoMapper(cfg, max_scans=max(64, len(log)))
        return _run_karto(args, log, true, cfg, mapper)
    cfg = KartoConfig(
        num_beams=log.num_beams,
        use_scan_range=min(log.range_max, 12.0),
        scan_buffer_size=20,
        correlation_search_space_dimension=0.32,
        correlation_search_space_resolution=0.02,
        correlation_search_space_smear_deviation=0.04,
        loop_search_space_dimension=4.0,
        loop_search_space_resolution=0.1,
        loop_search_space_smear_deviation=0.1,
        loop_search_maximum_distance=1.5,
        loop_match_minimum_chain_size=4,
        loop_match_minimum_response_coarse=0.5,
        loop_match_minimum_response_fine=0.5,
    )
    mapper = KartoMapper(cfg, max_scans=max(64, len(log)))
    return _run_karto(args, log, true, cfg, mapper)


def _run_karto(args, log, true, cfg, mapper):
    from tpuslam.utils.timing import StepTimer

    registry, laser_frame = _laser_registry(args, log)
    undis = _make_undistorter(args, log)

    def stage(i):
        """Scan + sensor-frame odometry for scan i, honoring the laser
        extrinsic: inverted mounts reverse the range array
        (karto_slam.cc:417-425) and the odometric search center is the
        LASER's world pose, base ∘ offset (karto_slam.cc:381-405).
        --undistort corrects AFTER the extrinsic staging, matching the
        reference chain (the undistortion node consumes the mounted
        laser's frames)."""
        if registry is None:
            scan = log.scan(i)
        else:
            from tpuslam.core.scan import make_scan

            ranges = registry.stage_ranges(laser_frame, log.ranges[i])
            scan = make_scan(
                ranges, angle_min=log.angle_min,
                angle_increment=log.angle_increment,
                range_min=log.range_min, range_max=log.range_max,
                time_increment=log.time_increment, num_beams=log.num_beams,
            )
        if undis is not None:
            scan = undis(i, scan)
        odom_i = (log.odom[i] if registry is None
                  else registry.sensor_pose(laser_frame, log.odom[i]))
        return scan, odom_i

    timer = StepTimer()
    pub = None
    if getattr(args, "map_stream", None) is not None:

        def _export():
            g = mapper.occupancy_grid()
            return (np.asarray(g[1]) if g is not None
                    else np.zeros((1, 1), np.int8))

        pub = _make_map_publisher(args.map_stream, _export)
    loops = 0
    kept_truth = []
    for i in range(len(log)):
        scan_i, odom_i = stage(i)
        with timer.stage("karto_process"):
            res = mapper.process(scan_i, odom_i,
                                 time=float(log.stamps[i]))
        if res.processed:
            loops += int(res.loop_closed)
            if true is not None:
                kept_truth.append(true[i])
            if pub is not None:
                pub.maybe_publish(float(log.stamps[i]))
    n = len(mapper.records)
    # mapper poses are LASER (sensor) poses; with --laser-mount set,
    # convert back to the base frame before comparing against the base
    # ground truth or saving — otherwise the constant extrinsic lever arm
    # shows up as spurious ATE
    out_poses = mapper.poses[:n].copy()
    if registry is not None:
        from tpuslam.models.karto import _np_compose, _np_inverse

        off = registry.get(laser_frame).offset_pose
        inv = _np_inverse(np.asarray(off, np.float64))
        out_poses = np.stack([_np_compose(p, inv) for p in out_poses])
    ate = None
    if kept_truth:
        kt = np.stack(kept_truth)[:n]
        ate = float(np.sqrt(((out_poses[:, :2] - kt[:, :2]) ** 2)
                            .sum(1)).mean())
    if args.report:
        print(timer.report(), file=sys.stderr)
    arrays = {"poses": out_poses}
    if args.save or args.png:
        grid = mapper.occupancy_grid()
        if grid is not None:
            arrays["map"] = np.asarray(grid[1])
            if args.png:
                from tpuslam.utils.viz import karto_graph_segments, render_map

                render_map(
                    args.png, arrays["map"], resolution=grid[0].resolution,
                    origin=(grid[0].origin_x, grid[0].origin_y),
                    trajectory=mapper.poses[:n],
                    graph_edges=karto_graph_segments(mapper), title="karto",
                )
    _emit(
        {"workload": "karto", "scans_processed": n,
         "edges": len(mapper.edges), "loop_closures": loops,
         "ate_rmse": ate},
        args.save,
        arrays,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpuslam",
                                 description="TPU-native 2D laser SLAM")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("synth", help="generate a synthetic scan log")
    p.add_argument("--out", required=True)
    _add_common(p)
    p.set_defaults(fn=cmd_synth)

    for name, fn in [
        ("scan-info", cmd_scan_info),
        ("pointcloud", cmd_pointcloud),
        ("features", cmd_features),
        ("scan-match-icp", cmd_icp),
        ("plicp-odometry", cmd_plicp),
        ("occupancy-map", cmd_occupancy),
        ("hector", cmd_hector),
        ("undistort", cmd_undistort),
        ("karto", cmd_karto),
    ]:
        p = sub.add_parser(name)
        _add_common(p)
        p.set_defaults(fn=fn)

    args = ap.parse_args(argv)
    if not args.log and not args.synthetic and args.cmd != "synth":
        ap.error("provide --log PATH or --synthetic")
    # warn (never silently ignore) when a common flag is set but the
    # selected workload does not consume it
    honored = {
        "map_stream": ("karto", "hector"),
        "laser_mount": ("karto", "plicp-odometry"),
        "config": ("karto", "hector"),
        "undistort": ("karto", "hector"),
        "png": ("karto", "hector"),
        "save": ("pointcloud", "features", "scan-match-icp",
                 "plicp-odometry", "occupancy-map", "hector", "undistort",
                 "karto"),
    }
    for flag, cmds in honored.items():
        if getattr(args, flag, None) and args.cmd not in cmds:
            print(f"warning: --{flag.replace('_', '-')} is only "
                  f"implemented for {', '.join(cmds)}; ignored for "
                  f"{args.cmd}", file=sys.stderr)
    args.fn(args)


if __name__ == "__main__":
    main()
