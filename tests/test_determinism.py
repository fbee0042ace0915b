"""Determinism under jit: identical inputs produce bit-identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.config import HectorConfig, PlicpConfig
from tpuslam.core.scan import make_scan, scan_to_points
from tpuslam.io.simulate import rect_room, simulate_scan
from tpuslam.match.plicp import plicp
from tpuslam.models import hector_slam


def make_inputs():
    segs = rect_room(8.0, 6.0)
    r, amin, ainc = simulate_scan(segs, np.zeros(3), num_beams=120,
                                  max_range=20.0)
    return make_scan(r, angle_min=amin, angle_increment=ainc, range_min=0.1,
                     range_max=20.0, num_beams=120)


def test_hector_step_deterministic():
    cfg = HectorConfig(map_size=128, map_multi_res_levels=2, num_beams=120,
                       ray_steps=128)
    sc = make_inputs()
    outs = []
    for _ in range(2):
        st = hector_slam.init_state(cfg)
        st, _ = hector_slam.step(cfg, st, sc, map_without_matching=True)
        st, res = hector_slam.step(cfg, st, sc)
        outs.append((np.asarray(st.pose), np.asarray(st.log_odds[0])))
    assert (outs[0][0] == outs[1][0]).all()
    assert (outs[0][1] == outs[1][1]).all()


def test_plicp_deterministic():
    cfg = PlicpConfig(num_beams=120)
    sc = make_inputs()
    pts, valid = scan_to_points(sc)
    a = plicp(cfg, pts, valid, pts, valid, jnp.asarray([0.02, 0.01, 0.01]))
    b = plicp(cfg, pts, valid, pts, valid, jnp.asarray([0.02, 0.01, 0.01]))
    assert (np.asarray(a.pose) == np.asarray(b.pose)).all()
