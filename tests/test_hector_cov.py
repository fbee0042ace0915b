"""Hector sampling covariance / likelihood parity helpers."""

import numpy as np
import jax.numpy as jnp

from tpuslam.core.scan import make_scan, scan_to_points
from tpuslam.io.simulate import rect_room, simulate_scan
from tpuslam.match.hector_cov import (
    covariance_to_world,
    likelihood_for_state,
    residual_for_state,
    sample_covariance,
)
from tpuslam.core.config import HectorConfig
from tpuslam.models import hector_slam
from tpuslam.ops.bilinear import prob_from_log_odds

CFG = HectorConfig(map_size=256, map_resolution=0.05, num_beams=181,
                   ray_steps=256)


def setup():
    segs = rect_room(8.0, 6.0)
    r, amin, ainc = simulate_scan(segs, np.zeros(3), num_beams=181,
                                  max_range=20.0)
    sc = make_scan(r, angle_min=amin, angle_increment=ainc, range_min=0.1,
                   range_max=20.0, num_beams=181)
    st = hector_slam.init_state(CFG)
    st, _ = hector_slam.step(CFG, st, sc, map_without_matching=True)
    grid = prob_from_log_odds(st.log_odds[0])
    pts, valid = scan_to_points(sc)
    spec = hector_slam.make_specs(CFG)[0]
    pose_map = spec.world_pose_to_map(jnp.zeros(3))
    return grid, pts / spec.resolution, valid, pose_map, spec


def test_likelihood_peaks_at_true_pose():
    grid, pts, valid, pose_map, _ = setup()
    lh_true = float(likelihood_for_state(grid, pts, valid, pose_map))
    lh_off = float(
        likelihood_for_state(grid, pts, valid, pose_map + jnp.asarray([8.0, 0, 0]))
    )
    assert lh_true > lh_off
    assert 0.5 < lh_true <= 1.0
    # residual is non-negative and consistent with the likelihood
    r = float(residual_for_state(grid, pts, valid, pose_map))
    n = int(np.asarray(valid).sum())
    assert np.isclose(lh_true, 1.0 - r / n, atol=1e-5)


def test_sample_covariance_psd_and_informative():
    grid, pts, valid, pose_map, spec = setup()
    cov = np.asarray(sample_covariance(grid, pts, valid, pose_map))
    assert np.allclose(cov, cov.T, atol=1e-6)
    evals = np.linalg.eigvalsh(cov)
    assert (evals >= -1e-6).all()
    assert cov[0, 0] > 0 and cov[1, 1] > 0 and cov[2, 2] > 0


def test_covariance_world_scaling():
    cov_map = jnp.asarray(np.diag([4.0, 9.0, 0.01]), jnp.float32)
    w = np.asarray(covariance_to_world(cov_map, 0.05))
    assert np.isclose(w[0, 0], 4.0 * 0.05**2)
    assert np.isclose(w[1, 1], 9.0 * 0.05**2)
    assert np.isclose(w[2, 2], 0.01)
