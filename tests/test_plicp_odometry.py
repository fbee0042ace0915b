"""PL-ICP keyframe odometry over synthetic trajectories."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.config import PlicpConfig
from tpuslam.core.scan import make_scan
from tpuslam.io.simulate import circle_trajectory, simulate_scan, world_with_boxes
from tpuslam.models import plicp_odometry, scan_match_icp
from tpuslam.core.config import IcpConfig

SEGS = world_with_boxes()
CFG = PlicpConfig(num_beams=360)


def scan_at(pose, nb=360):
    r, amin, ainc = simulate_scan(SEGS, pose, num_beams=nb, max_range=30.0)
    return make_scan(r, angle_min=amin, angle_increment=ainc,
                     range_min=0.1, range_max=30.0, num_beams=nb)


def test_odometry_tracks_circle():
    traj = circle_trajectory(radius=1.2, num_poses=100)[:50]
    st = plicp_odometry.init_state(CFG)
    # odometry starts at the first pose's frame: feed poses relative to start
    import tpuslam.core.se2 as se2

    t0 = jnp.asarray(traj[0], jnp.float32)
    errs = []
    for p in traj:
        st, info = plicp_odometry.step(CFG, st, scan_at(p), dt=0.1)
        rel_true = np.asarray(se2.relative(t0, jnp.asarray(p, jnp.float32)))
        e = np.asarray(info.pose) - rel_true
        e[2] = np.arctan2(np.sin(e[2]), np.cos(e[2]))
        errs.append(np.abs(e))
    errs = np.stack(errs)
    ate = np.sqrt((errs[:, :2] ** 2).sum(1)).mean()
    assert ate < 0.05, ate
    assert errs[:, 2].max() < 0.06, errs[:, 2].max()


def test_keyframe_machinery():
    st = plicp_odometry.init_state(CFG)
    sc = scan_at(np.zeros(3))
    st, info = plicp_odometry.step(CFG, st, sc)
    assert bool(info.new_keyframe)  # first scan keys
    # static robot: no new keyframe until kf_scan_count exceeded
    kf_count = 0
    for i in range(CFG.kf_scan_count + 2):
        st, info = plicp_odometry.step(CFG, st, sc)
        kf_count += int(info.new_keyframe)
    assert kf_count == 1  # exactly the count-triggered rekey
    assert np.allclose(np.asarray(st.base_in_odom), 0.0, atol=5e-3)


def test_run_trajectory_scan_fold():
    traj = circle_trajectory(radius=1.2, num_poses=100)[:10]
    scans = [scan_at(p) for p in traj]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    st = plicp_odometry.init_state(CFG)
    final, poses = plicp_odometry.run_trajectory(
        CFG, st, batched, jnp.full(10, 0.1)
    )
    assert poses.shape == (10, 3)
    assert bool(final.initialized)


def test_lesson2_frame_to_frame():
    import tpuslam.core.se2 as se2

    cfg = IcpConfig(num_beams=360, max_iterations=20)
    st = scan_match_icp.init_state(cfg)
    pa = np.zeros(3)
    pb = np.array([0.06, -0.04, 0.05])
    st, res0 = scan_match_icp.step(cfg, st, scan_at(pa))
    assert not bool(res0.converged)  # first frame: no match yet
    st, res1 = scan_match_icp.step(cfg, st, scan_at(pb))
    assert bool(res1.converged)
    # direction: last onto current = b⁻¹ ∘ a
    want = np.asarray(se2.relative(jnp.asarray(pb, jnp.float32), jnp.zeros(3)))
    assert np.allclose(np.asarray(res1.pose), want, atol=0.02)


def test_lesson3_frame_to_frame_plicp():
    from tpuslam.models import scan_match_plicp

    cfg = PlicpConfig(num_beams=360)
    st = scan_match_plicp.init_state(cfg)
    pa = np.zeros(3)
    pb = np.array([0.07, -0.04, 0.05])
    st, r0 = scan_match_plicp.step(cfg, st, scan_at(pa))
    assert not bool(r0.valid)  # first frame: nothing to match
    st, r1 = scan_match_plicp.step(cfg, st, scan_at(pb))
    assert bool(r1.valid)
    import tpuslam.core.se2 as se2

    want = np.asarray(se2.relative(jnp.zeros(3), jnp.asarray(pb, jnp.float32)))
    assert np.allclose(np.asarray(r1.pose), want, atol=0.02)


def test_visibility_mask_kills_nonmonotonic_rays():
    """CSM visibilityTest semantics: a ray whose polar angle from the NEW
    viewpoint decreases vs the previous valid ray is invalidated."""
    import jax.numpy as jnp

    from tpuslam.match.plicp import visibility_mask

    # rays at increasing scan angle; from the origin all angles increase
    ang = np.linspace(-1.0, 1.0, 9)
    pts = np.stack([2 * np.cos(ang), 2 * np.sin(ang)], -1)
    # make ray 4 jump backwards in bearing when viewed from (1.5, 0):
    # pull it close to the viewpoint and below the previous ray's bearing
    pts[4] = [1.6, -0.5]
    valid = np.ones(9, bool)
    keep0 = visibility_mask(jnp.asarray(pts, jnp.float32),
                            jnp.asarray(valid), jnp.zeros(2))
    keep1 = visibility_mask(jnp.asarray(pts, jnp.float32),
                            jnp.asarray(valid), jnp.asarray([1.5, 0.0],
                                                            jnp.float32))
    k0, k1 = np.asarray(keep0), np.asarray(keep1)
    assert not k0.all() or True  # origin view may already cull pts[4]
    assert not k1[4], k1  # the displaced viewpoint sees it from behind
    # invalidated rays stop acting as comparators: ray 5 survives
    assert k1[5], k1
    # invalid input rays stay invalid
    valid[2] = False
    k2 = np.asarray(visibility_mask(jnp.asarray(pts, jnp.float32),
                                    jnp.asarray(valid),
                                    jnp.zeros(2)))
    assert not k2[2]


def test_do_visibility_test_flips_matcher_behavior():
    """The knob must change the correspondence set on an occluded scan
    (round-1 gap: accepted-but-ignored)."""
    import dataclasses

    import jax.numpy as jnp

    from tpuslam.core.config import PlicpConfig
    from tpuslam.match.plicp import plicp

    rng = np.random.default_rng(0)
    ang = np.linspace(-2.0, 2.0, 240)
    r = 3.0 + 0.3 * np.sin(2 * ang)
    ref = np.stack([r * np.cos(ang), r * np.sin(ang)], -1)
    # occluding notch: a block of rays pulled very close, so that viewed
    # from a forward-displaced sensor their bearings run backwards
    ref[100:120] = ref[100:120] * np.linspace(0.2, 0.15, 20)[:, None]
    src = ref + rng.normal(0, 0.005, ref.shape)
    valid = np.ones(240, bool)
    cfg0 = PlicpConfig(num_beams=240, max_iterations=6,
                       do_visibility_test=0)
    cfg1 = dataclasses.replace(cfg0, do_visibility_test=1)
    guess = jnp.asarray([0.5, 0.0, 0.0], jnp.float32)
    r0 = plicp(cfg0, jnp.asarray(src, jnp.float32), jnp.asarray(valid),
               jnp.asarray(ref, jnp.float32), jnp.asarray(valid), guess)
    r1 = plicp(cfg1, jnp.asarray(src, jnp.float32), jnp.asarray(valid),
               jnp.asarray(ref, jnp.float32), jnp.asarray(valid), guess)
    assert int(r1.num_inliers) < int(r0.num_inliers)
