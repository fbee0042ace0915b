"""Pallas hector GN kernel vs the XLA MXU formulation.

The kernel only lowers on real TPU hardware; on the CPU test backend it runs
through the Pallas interpreter on tiny shapes (slow but exact)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.core.config import HectorConfig
from tpuslam.core.scan import make_scan, scan_to_points
from tpuslam.io.simulate import rect_room, simulate_scan
from tpuslam.match.hector import match_level
from tpuslam.models import hector_slam
from tpuslam.ops.bilinear import prob_from_log_odds


def setup(num_beams=128, map_size=256):
    cfg = HectorConfig(map_size=map_size, map_resolution=0.05,
                       num_beams=num_beams, ray_steps=256,
                       laser_max_dist=6.0)
    segs = rect_room(8.0, 6.0)
    r, amin, ainc = simulate_scan(segs, np.zeros(3), num_beams=num_beams,
                                  max_range=20.0)
    sc = make_scan(r, angle_min=amin, angle_increment=ainc, range_min=0.1,
                   range_max=6.0, num_beams=num_beams)
    st = hector_slam.init_state(cfg)
    st, _ = hector_slam.step(cfg, st, sc, map_without_matching=True)
    spec = hector_slam.make_specs(cfg)[0]
    grid = prob_from_log_odds(st.log_odds[0])
    pts, valid = scan_to_points(sc)
    return cfg, spec, grid, pts / spec.resolution, valid


def test_pallas_matches_xla_interpreter():
    from tpuslam.ops import pallas_hector
    from jax.experimental import pallas as pl

    cfg, spec, grid, pts_map, valid = setup()
    pose0 = spec.world_pose_to_map(jnp.asarray([0.04, -0.03, 0.02],
                                               jnp.float32))
    window = 256  # full grid: crop is the whole map on this small fixture

    pose_x, h_x, score_x = match_level(
        grid, pts_map, valid, pose0, num_iters=3, window=window,
        compute_dtype=jnp.bfloat16,
    )

    # run the kernel through the interpreter (CPU backend in tests)
    orig = pallas_hector.pl.pallas_call
    pallas_hector.pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        poses, hs, scores = pallas_hector.match_level_pallas(
            grid, pts_map[None], valid[None], pose0[None],
            window=window, num_iters=3,
        )
    finally:
        pallas_hector.pl.pallas_call = orig

    # the kernel lerps in f32 after a pure-one-hot matmul while the XLA
    # path folds fractions into bf16 one-hots — each converges to its own
    # bf16-perturbed optimum; they must agree to well under a cell
    # (0.15 cells = 7.5 mm at 5 cm resolution) with matching scores
    err = np.abs(np.asarray(poses[0]) - np.asarray(pose_x))
    assert err.max() < 0.15, (poses[0], pose_x)
    assert np.allclose(np.asarray(hs[0]), np.asarray(h_x), rtol=0.2,
                       atol=5.0)
    assert abs(float(scores[0]) - float(score_x)) < 0.05
