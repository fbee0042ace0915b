"""Hector GN matcher + engine: pose recovery and mapping on synthetic worlds."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.config import HectorConfig
from tpuslam.core.scan import make_scan
from tpuslam.io.simulate import (
    circle_trajectory,
    rect_room,
    simulate_scan,
    world_with_boxes,
)
from tpuslam.match.hector import match_pyramid
from tpuslam.models import hector_slam

CFG = HectorConfig(map_size=256, map_resolution=0.05, num_beams=181, ray_steps=256)
SEGS = rect_room(8.0, 6.0)


def scan_at(pose, num_beams=181, noise=0.0, segs=SEGS):
    r, amin, ainc = simulate_scan(
        segs, pose, num_beams=num_beams, max_range=20.0, noise_std=noise
    )
    return make_scan(
        r, angle_min=amin, angle_increment=ainc, range_min=0.1, range_max=20.0,
        num_beams=num_beams,
    )


def build_map(poses):
    st = hector_slam.init_state(CFG)
    for p in poses:
        st, _ = hector_slam.step(
            CFG, st, scan_at(p), map_without_matching=True
        )
        st = st._replace(
            pose=jnp.asarray(p, jnp.float32),
            last_update_pose=jnp.asarray(p, jnp.float32) + 10.0,  # force update
        )
    return st


def test_match_recovers_perturbed_pose():
    # map built from a few known poses; then match a scan from a true pose
    # starting from a perturbed initial guess
    map_poses = [
        np.array([0.0, 0.0, 0.0]),
        np.array([0.3, 0.2, 0.3]),
        np.array([-0.3, -0.2, -0.3]),
    ]
    st = hector_slam.init_state(CFG)
    for p in map_poses:
        sc = scan_at(p)
        st = st._replace(pose=jnp.asarray(p, jnp.float32))
        st, _ = hector_slam.step(CFG, st, sc, map_without_matching=True)
        st = st._replace(last_update_pose=jnp.asarray(p, jnp.float32))
        # force next update regardless of motion gate
        st = st._replace(num_updates=jnp.zeros((), jnp.int32))

    true_pose = np.array([0.12, -0.08, 0.1])
    sc = scan_at(true_pose)
    from tpuslam.core.scan import scan_to_points
    from tpuslam.ops.bilinear import prob_from_log_odds

    pts, valid = scan_to_points(sc)
    specs = hector_slam.make_specs(CFG)
    grids = tuple(prob_from_log_odds(lo) for lo in st.log_odds)
    guess = jnp.asarray(true_pose + np.array([0.06, -0.05, 0.05]), jnp.float32)
    res = match_pyramid(specs, grids, pts, valid, guess)
    err = np.asarray(res.pose) - true_pose
    assert abs(err[0]) < 0.02 and abs(err[1]) < 0.02, res.pose
    assert abs(err[2]) < 0.02, res.pose


def test_engine_tracks_trajectory():
    segs = world_with_boxes()
    cfg = dataclasses.replace(CFG, num_beams=361,
                              map_update_distance_thresh=0.1,
                              map_update_angle_thresh=0.15)
    # realistic scan-to-scan motion: ~0.08 m / ~3 deg per scan
    traj = circle_trajectory(radius=1.5, num_poses=120)[:60]
    st = hector_slam.init_state(cfg)
    # seed: first scan maps without matching at the true start pose
    st = st._replace(pose=jnp.asarray(traj[0], jnp.float32))
    st, _ = hector_slam.step(cfg, st, scan_at(traj[0], segs=segs,
                                              num_beams=361),
                             map_without_matching=True)
    errs = []
    for p in traj[1:]:
        st, res = hector_slam.step(cfg, st,
                                   scan_at(p, segs=segs, num_beams=361))
        e = np.asarray(st.pose) - p
        e[2] = np.arctan2(np.sin(e[2]), np.cos(e[2]))
        errs.append(np.abs(e))
    errs = np.stack(errs)
    ate = np.sqrt((errs[:, :2] ** 2).sum(axis=1)).mean()
    assert ate < 0.05, ate
    assert errs[:, 2].max() < 0.1, errs[:, 2].max()


def test_engine_map_marks_walls():
    st = build_map([np.array([0.0, 0.0, 0.0])])
    img = np.asarray(hector_slam.occupancy_image(st))
    spec = hector_slam.make_specs(CFG)[0]
    # wall at x=4: map coord
    mx = int((4.0 - spec.origin_x) / spec.resolution)
    my = int((0.0 - spec.origin_y) / spec.resolution)
    assert img[my, mx] == 100 or img[my, mx - 1] == 100
    # free space along the way
    assert img[my, mx - 20] == 0
    # unknown far behind the wall
    assert img[my, mx + 40] == -1


def test_run_trajectory_scan_fold():
    poses = circle_trajectory(radius=1.0, num_poses=8)
    scans = [scan_at(p) for p in poses]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    st = hector_slam.init_state(CFG)
    st = st._replace(pose=jnp.asarray(poses[0], jnp.float32))
    final, out_poses = hector_slam.run_trajectory(CFG, st, batched)
    assert out_poses.shape == (8, 3)
    assert int(final.num_updates) >= 1


def test_match_pyramid_batched_impls_agree():
    from tpuslam.match.hector import match_pyramid_batched
    from tpuslam.ops.bilinear import prob_from_log_odds

    st = build_map([np.array([0.0, 0.0, 0.0]), np.array([0.3, 0.2, 0.3])])
    specs = hector_slam.make_specs(CFG)
    grids = tuple(prob_from_log_odds(lo) for lo in st.log_odds)
    from tpuslam.core.scan import scan_to_points

    scans = [scan_at(np.array([0.05 * i, -0.03 * i, 0.02 * i]))
             for i in range(4)]
    pts = jnp.stack([scan_to_points(s)[0] for s in scans])
    valid = jnp.stack([scan_to_points(s)[1] for s in scans])
    guesses = jnp.asarray(
        [[0.05 * i + 0.04, -0.03 * i - 0.03, 0.02 * i + 0.02]
         for i in range(4)], jnp.float32)
    a = match_pyramid_batched(specs, grids, pts, valid, guesses,
                              max_point_range=12.0, impl="mxu")
    b = match_pyramid_batched(specs, grids, pts, valid, guesses,
                              max_point_range=12.0, impl="gather")
    assert np.allclose(np.asarray(a.pose), np.asarray(b.pose), atol=2e-3)


def test_run_trajectory_matches_step_loop():
    """The lax.scan fold must produce bit-identical poses to stepping."""
    poses = circle_trajectory(radius=1.0, num_poses=6)
    scans = [scan_at(p) for p in poses]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    st0 = hector_slam.init_state(CFG)
    st0 = st0._replace(pose=jnp.asarray(poses[0], jnp.float32))
    _, fold_poses = hector_slam.run_trajectory(CFG, st0, batched)

    st = hector_slam.init_state(CFG)
    st = st._replace(pose=jnp.asarray(poses[0], jnp.float32))
    loop_poses = []
    for s in scans:
        st, res = hector_slam.step(CFG, st, s)
        loop_poses.append(np.asarray(res.pose))
    assert np.allclose(np.asarray(fold_poses), np.stack(loop_poses), atol=1e-6)
