"""Frame-to-frame PL-ICP matching (lesson3 ``scan_match_plicp`` node).

The reference's standalone PL-ICP demo matches each scan against the
PREVIOUS scan with CSM and prints the transform (reference:
lesson3/src/scan_match_plicp.cc:191-232: ref = last LDP, sens = current,
zero initial guess).  Engine form mirrors models/scan_match_icp.py with the
PL-ICP kernel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core.config import PlicpConfig
from tpuslam.core.scan import Scan, scan_to_points
from tpuslam.match.plicp import PlicpResult, plicp

Array = jax.Array


class FrameState(NamedTuple):
    last_pts: Array  # [B, 2]
    last_valid: Array  # [B]
    initialized: Array  # bool


def init_state(cfg: PlicpConfig, dtype=jnp.float32) -> FrameState:
    return FrameState(
        last_pts=jnp.zeros((cfg.num_beams, 2), dtype),
        last_valid=jnp.zeros((cfg.num_beams,), bool),
        initialized=jnp.zeros((), bool),
    )


@partial(jax.jit, static_argnames=("cfg",))
def step(
    cfg: PlicpConfig, state: FrameState, scan: Scan
) -> tuple[FrameState, PlicpResult]:
    """Match current scan against the previous one; returns the pose of the
    current frame in the previous frame (scan_match_plicp.cc:219-227)."""
    pts, valid = scan_to_points(scan)

    def first(_):
        return PlicpResult(
            pose=jnp.zeros(3, pts.dtype),
            valid=jnp.zeros((), bool),
            mean_error=jnp.zeros((), pts.dtype),
            num_inliers=jnp.zeros((), jnp.int32),
            covariance=jnp.eye(3, dtype=pts.dtype),
        )

    def match(_):
        return plicp(cfg, pts, valid, state.last_pts, state.last_valid)

    res = jax.lax.cond(state.initialized, match, first, None)
    new_state = FrameState(
        last_pts=pts, last_valid=valid, initialized=jnp.ones((), bool)
    )
    return new_state, res
