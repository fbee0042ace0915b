"""Sharded batched SLAM over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.core.config import HectorConfig
from tpuslam.core.scan import make_scan
from tpuslam.io.simulate import rect_room, simulate_scan
from tpuslam.models import hector_slam
from tpuslam.parallel.mesh import batch_step, make_mesh, sharded_batch_step

CFG = HectorConfig(
    map_size=128, map_multi_res_levels=2, num_beams=64, ray_steps=64,
    laser_max_dist=12.0,
)


def make_batch(n):
    segs = rect_room(8.0, 6.0)
    scans = []
    for i in range(n):
        p = np.array([0.02 * i, -0.01 * i, 0.01 * i])
        r, amin, ainc = simulate_scan(segs, p, num_beams=64, max_range=20.0)
        scans.append(make_scan(r, angle_min=amin, angle_increment=ainc,
                               range_min=0.1, range_max=20.0, num_beams=64))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scans)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_runs_and_updates_map():
    mesh = make_mesh(8)
    scans = make_batch(16)
    state = hector_slam.init_state(CFG)
    step = sharded_batch_step(CFG, mesh)
    new_state, poses = step(state, scans)
    jax.block_until_ready(poses)
    assert poses.shape == (16, 3)
    assert int(new_state.num_updates) == 1
    # the joint update must have written occupied cells
    assert float(new_state.log_odds[0].max()) > 0.0


def test_sharded_matches_unsharded():
    mesh = make_mesh(8)
    scans = make_batch(8)
    state = hector_slam.init_state(CFG)
    sharded = sharded_batch_step(CFG, mesh)(state, scans)
    local = jax.jit(lambda s, sc: batch_step(CFG, s, sc))(state, scans)
    np.testing.assert_allclose(
        np.asarray(sharded[1]), np.asarray(local[1]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded[0].log_odds[0]),
        np.asarray(local[0].log_odds[0]),
        atol=1e-5,
    )


def test_events_bus():
    from tpuslam.utils.events import EventBus

    bus = EventBus()
    got = []
    unsub = bus.subscribe(lambda e, p: got.append((e, p)))
    bus.fire("loop_closure_check", scan=3, coarse_response=0.7)
    assert got == [("loop_closure_check", {"scan": 3, "coarse_response": 0.7})]
    unsub()
    bus.fire("x")
    assert len(got) == 1


def test_batch_match_recovers_poses():
    from tpuslam.parallel.mesh import batch_match

    # denser fixture than the sharding smoke tests: the 64-beam 6.4 m map
    # is too sparse for accuracy assertions
    cfg = HectorConfig(map_size=256, map_multi_res_levels=2, num_beams=180,
                       ray_steps=192, laser_max_dist=12.0)
    segs = rect_room(8.0, 6.0)
    state = hector_slam.init_state(cfg)
    r, amin, ainc = simulate_scan(segs, np.zeros(3), num_beams=180,
                                  max_range=20.0)
    sc = make_scan(r, angle_min=amin, angle_increment=ainc, range_min=0.1,
                   range_max=20.0, num_beams=180)
    state, _ = hector_slam.step(cfg, state, sc, map_without_matching=True)

    want = np.stack([[0.02 * i, -0.01 * i, 0.01 * i] for i in range(4)])
    scans = []
    for p in want:
        r, amin, ainc = simulate_scan(segs, p, num_beams=180, max_range=20.0)
        scans.append(make_scan(r, angle_min=amin, angle_increment=ainc,
                               range_min=0.1, range_max=20.0, num_beams=180))
    import jax as _jax

    batched = _jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    poses, scores = batch_match(cfg, state, batched)
    got = np.asarray(poses)
    assert np.allclose(got, want, atol=0.05), (got, want)
    assert (np.asarray(scores) > 0.3).all()


def test_karto_graph_segments():
    from tpuslam.utils.viz import karto_graph_segments

    class FakeMapper:
        poses = np.array([[0.0, 0.0, 0.0], [1.0, 0.5, 0.1]])
        edges = [(0, 1, None, None)]

    segs = karto_graph_segments(FakeMapper())
    assert segs.shape == (1, 2, 2)
    assert np.allclose(segs[0, 1], [1.0, 0.5])


def test_2d_mesh_scan_by_beam():
    from tpuslam.parallel.mesh import make_mesh_2d, sharded_batch_step

    mesh = make_mesh_2d(8)  # 4 x 2: scans x beams
    assert mesh.devices.shape == (4, 2)
    scans = make_batch(8)
    state = hector_slam.init_state(CFG)
    step = sharded_batch_step(CFG, mesh)
    new_state, poses = step(state, scans)
    jax.block_until_ready(poses)
    assert poses.shape == (8, 3)
    # identical numerics to the unsharded step
    local = jax.jit(lambda s, sc: batch_step(CFG, s, sc))(state, scans)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(local[1]),
                               atol=1e-5)


def test_mesh_size_errors_are_clear():
    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh(16)
    from tpuslam.parallel.mesh import make_mesh_2d

    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh_2d(16)
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh_2d(8, scan_axis=3)


def test_driver_dryrun_local_8():
    """The exact body the driver gate runs, on the 8-device conftest mesh."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _dryrun_local

    _dryrun_local(8)


def _correlative_fixture(nb=128, chain=4, seed=0):
    from tpuslam.core import se2

    rng = np.random.default_rng(seed)
    angles = np.linspace(-2.0, 2.0, nb)
    r = 5.0 + np.sin(3 * angles)
    local = np.stack([r * np.cos(angles), r * np.sin(angles)], -1)
    base = local[None] + rng.normal(0, 0.03, (chain, nb, 2))
    local_pts = jnp.asarray(local, jnp.float32)
    valid = jnp.ones(nb, bool)
    base_pts = jnp.asarray(base, jnp.float32)
    base_valid = jnp.ones((chain, nb), bool)
    return local_pts, valid, base_pts, base_valid


@pytest.mark.parametrize("method", ["patch", "fft"])
def test_sharded_correlative_matches_unsharded(method):
    """The (x, y, theta)-lattice-sharded MatchScan must agree with the
    single-device matcher (same tie averaging, same covariances)."""
    from tpuslam.match.correlative import CorrelativeSpec, match_scan
    from tpuslam.parallel.correlative import make_sharded_match_scan

    spec = CorrelativeSpec(
        resolution=0.02, search_dim=0.4, smear_deviation=0.04,
        range_threshold=8.0, response_method=method,
    )
    mesh = make_mesh(8, axis="lattice")
    local_pts, valid, base_pts, base_valid = _correlative_fixture()
    center = jnp.asarray([0.05, -0.03, 0.02], jnp.float32)

    sharded = make_sharded_match_scan(spec, mesh, penalize=True, refine=True)
    got = sharded(center, local_pts, valid, base_pts, base_valid)
    want = match_scan(spec, center, local_pts, valid, base_pts, base_valid,
                      penalize=True, refine=True)
    np.testing.assert_allclose(np.asarray(got.pose), np.asarray(want.pose),
                               atol=1e-5)
    np.testing.assert_allclose(float(got.response), float(want.response),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.covariance),
                               np.asarray(want.covariance), rtol=1e-4,
                               atol=1e-6)


def test_sharded_correlative_loop_geometry():
    """Sharded matcher at a loop-flavored operating point recovers a known
    offset (penalize=False, refine=False — the loop coarse pass)."""
    from tpuslam.core import se2
    from tpuslam.match.correlative import CorrelativeSpec
    from tpuslam.parallel.correlative import make_sharded_match_scan

    spec = CorrelativeSpec(
        resolution=0.05, search_dim=2.0, smear_deviation=0.1,
        range_threshold=8.0,
    )
    mesh = make_mesh(8, axis="lattice")
    local_pts, valid, base_pts, base_valid = _correlative_fixture()
    true_pose = jnp.asarray([0.4, -0.3, 0.0], jnp.float32)
    # base scans live in world frame at identity; the query scan claims to
    # sit at true_pose but its points were taken from identity, so the
    # matcher must pull it back by -offset
    wpts = se2.transform_points(true_pose, local_pts)
    base_w = jax.vmap(lambda p: p)(base_pts)  # already world frame
    sharded = make_sharded_match_scan(spec, mesh, penalize=False, refine=False)
    res = sharded(true_pose, local_pts, valid, base_w, base_valid)
    got = np.asarray(res.pose)
    assert abs(got[0] - 0.0) < 0.15 and abs(got[1] - 0.0) < 0.15, got
    assert float(res.response) > 0.5


def test_karto_loop_closure_with_sharded_lattice():
    """KartoMapper(loop_mesh=...) reproduces the single-device mapper run —
    same loop closures, same corrected poses (the coarse loop search runs
    SPMD over the 8-device mesh)."""
    import math

    from tpuslam.core.config import KartoConfig
    from tpuslam.io.simulate import simulate_scan as sim, world_with_boxes
    from tpuslam.models.karto import KartoMapper, _np_compose

    segs = world_with_boxes()
    cfg = KartoConfig(
        num_beams=180, use_scan_range=6.0,
        minimum_travel_distance=0.2, minimum_travel_heading=0.174,
        minimum_time_interval=3600.0, scan_buffer_size=20,
        scan_buffer_maximum_scan_distance=10.0,
        correlation_search_space_dimension=0.32,
        correlation_search_space_resolution=0.02,
        correlation_search_space_smear_deviation=0.04,
        loop_search_space_dimension=4.0, loop_search_space_resolution=0.1,
        loop_search_space_smear_deviation=0.1,
        loop_search_maximum_distance=1.5, loop_match_minimum_chain_size=4,
        loop_match_maximum_variance_coarse=0.4,
        loop_match_minimum_response_coarse=0.5,
        loop_match_minimum_response_fine=0.5,
        link_match_minimum_response_fine=0.6, link_scan_maximum_distance=1.5,
    )

    def scan_at(pose):
        r, amin, ainc = sim(segs, pose, num_beams=180, max_range=30.0)
        return make_scan(r, angle_min=amin, angle_increment=ainc,
                         range_min=0.1, range_max=30.0, num_beams=180)

    mesh = make_mesh(8, axis="lattice")
    m_ref = KartoMapper(cfg, max_scans=64)
    m_sh = KartoMapper(cfg, max_scans=64, loop_mesh=mesh)
    assert m_sh._sharded_loop_match is not None

    rng = np.random.default_rng(7)
    radius = 1.6
    true = np.array([radius, 0.0, math.pi / 2])
    odom = true.copy()
    closed_ref = closed_sh = False
    for i in range(46):
        s = scan_at(true)
        closed_ref |= m_ref.process(s, odom, time=0.0).loop_closed
        closed_sh |= m_sh.process(s, odom, time=0.0).loop_closed
        dth = 2 * math.pi / 40
        step = np.array([radius * dth, 0.0, dth])
        true = _np_compose(true, step)
        odom = _np_compose(odom, step + rng.normal(0, [0.01, 0.01, 0.005]))
    assert closed_ref and closed_sh
    assert m_ref.stats["loop_closures"] == m_sh.stats["loop_closures"]
    n = len(m_ref.records)
    np.testing.assert_allclose(m_sh.poses[:n], m_ref.poses[:n], atol=1e-4)


def test_karto_sharded_parallel_batch_matches_unsharded():
    """KartoMapper(batch_mesh=...) process_batch(parallel=True): the
    scan-axis-sharded flush program produces the same trajectory as the
    single-device program (each scan's match computes whole on one shard,
    so results are bit-comparable up to XLA reduction layout)."""
    import math

    from tpuslam.core.config import KartoConfig
    from tpuslam.io.simulate import simulate_scan as sim, world_with_boxes
    from tpuslam.models.karto import KartoMapper, _np_compose

    segs = world_with_boxes()
    cfg = KartoConfig(
        num_beams=96, use_scan_range=6.0,
        minimum_travel_distance=0.0, minimum_travel_heading=0.0,
        minimum_time_interval=0.0, scan_buffer_size=8,
        scan_buffer_maximum_scan_distance=10.0,
        correlation_search_space_dimension=0.32,
        correlation_search_space_resolution=0.02,
        correlation_search_space_smear_deviation=0.04,
        do_loop_closing=False,
    )
    mesh = make_mesh(8, axis="scan")
    rng = np.random.default_rng(3)
    true = np.zeros(3)
    odom = np.zeros(3)
    scans, odoms = [], []
    for _ in range(17):  # 1 first-scan + 16 batched (2 flushes of 8)
        r, amin, ainc = sim(segs, true, num_beams=96, max_range=30.0)
        scans.append(make_scan(r, angle_min=amin, angle_increment=ainc,
                               range_min=0.1, range_max=30.0, num_beams=96))
        odoms.append(odom.copy())
        step = np.array([0.08, 0.0, 0.04])
        true = _np_compose(true, step)
        odom = _np_compose(odom, step + rng.normal(0, [0.004, 0.004, 0.002]))

    m_ref = KartoMapper(cfg, max_scans=32)
    m_sh = KartoMapper(cfg, max_scans=32, batch_mesh=mesh)
    assert m_sh._sharded_parallel_steps is not None
    r_ref = m_ref.process_batch(scans, odoms, batch_size=8, parallel=True)
    r_sh = m_sh.process_batch(scans, odoms, batch_size=8, parallel=True)
    assert [r.processed for r in r_ref] == [r.processed for r in r_sh]
    n = len(m_ref.records)
    assert n == len(m_sh.records) == 17
    np.testing.assert_allclose(
        m_sh.poses[:n], m_ref.poses[:n], atol=1e-5
    )
