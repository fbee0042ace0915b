"""Log-odds grid update semantics (hector GridMapLogOdds/OccGridMapBase)."""

import math

import jax.numpy as jnp
import numpy as np

from tpuslam.core.grid import GridSpec
from tpuslam.ops.logodds import LOG_ODDS_CAP, update_grid

SPEC = GridSpec(resolution=1.0, size_x=32, size_y=32, origin_x=0.0, origin_y=0.0)
FREE_INC = math.log(0.4 / 0.6)
OCC_INC = math.log(0.9 / 0.1)


def run_update(lo, origin, endpoints, valid=None):
    endpoints = jnp.asarray(endpoints, jnp.float32)
    if valid is None:
        valid = jnp.ones(endpoints.shape[0], bool)
    return np.asarray(
        update_grid(
            SPEC,
            lo,
            jnp.asarray(origin, jnp.float32),
            endpoints,
            valid,
            max_steps=64,
            update_free=0.4,
            update_occ=0.9,
        )
    )


def test_single_beam_free_and_occupied():
    lo = jnp.zeros(SPEC.shape)
    out = run_update(lo, [2.0, 4.0], [[7.0, 4.0]])
    # free cells (2..6, 4); occupied endpoint (7, 4)   [grid indexed (iy, ix)]
    for x in range(2, 7):
        assert np.isclose(out[4, x], FREE_INC), (x, out[4, x])
    assert np.isclose(out[4, 7], OCC_INC)
    assert out.sum() != 0 and np.count_nonzero(out) == 6


def test_occupied_beats_free_same_scan():
    # beam A ends at (7,4); beam B passes through (7,4) to (12,4)
    lo = jnp.zeros(SPEC.shape)
    out = run_update(lo, [2.0, 4.0], [[7.0, 4.0], [12.0, 4.0]])
    assert np.isclose(out[4, 7], OCC_INC)  # not OCC_INC + FREE_INC


def test_cell_touched_once_per_scan():
    # two parallel beams sharing free cells must add FREE_INC once
    lo = jnp.zeros(SPEC.shape)
    out = run_update(lo, [2.0, 4.0], [[9.0, 3.9], [9.0, 4.1]])
    assert np.isclose(out[4, 5], FREE_INC)


def test_occupied_cap():
    lo = jnp.full(SPEC.shape, LOG_ODDS_CAP + 1.0)
    out = run_update(lo, [2.0, 4.0], [[7.0, 4.0]])
    assert out[4, 7] == LOG_ODDS_CAP + 1.0  # saturated: no further increment
    assert np.isclose(out[4, 3], LOG_ODDS_CAP + 1.0 + FREE_INC)  # free unaffected by cap


def test_invalid_beams_ignored():
    lo = jnp.zeros(SPEC.shape)
    out = run_update(
        lo, [2.0, 4.0], [[7.0, 4.0]], valid=jnp.zeros(1, bool)
    )
    assert np.count_nonzero(out) == 0


def test_out_of_bounds_endpoint_cancels_line():
    lo = jnp.zeros(SPEC.shape)
    out = run_update(lo, [2.0, 4.0], [[200.0, 4.0]])
    # reference semantics (OccGridMapBase.h:220-240): a beam whose end
    # cell is outside the map updates NOTHING — whole-line cancellation,
    # not per-cell clipping
    assert np.count_nonzero(out) == 0


def test_begin_equals_end_cell_skipped():
    lo = jnp.zeros(SPEC.shape)
    # endpoint rounds to the sensor cell: skipped entirely, no occ mark
    # (OccGridMapBase.h:155-159)
    out = run_update(lo, [2.0, 4.0], [[2.2, 4.1]])
    assert np.count_nonzero(out) == 0
