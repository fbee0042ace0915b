"""Frame-to-frame ICP matching (lesson2 ``scan_match_icp`` node).

The reference keeps the previous scan and aligns it to the current one with
PCL ICP, printing (x, y, yaw) when converged (reference:
lesson2/src/scan_match_icp.cc:56-164; note its direction: source = LAST
scan, target = CURRENT scan, 135-147).  Engine form: a two-slot state and a
jitted step returning the inter-frame transform.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core.config import IcpConfig
from tpuslam.core.scan import Scan, scan_to_points
from tpuslam.match.icp import IcpResult, icp

Array = jax.Array


class FrameState(NamedTuple):
    last_pts: Array  # [B, 2]
    last_valid: Array  # [B]
    initialized: Array  # bool


def init_state(cfg: IcpConfig, dtype=jnp.float32) -> FrameState:
    return FrameState(
        last_pts=jnp.zeros((cfg.num_beams, 2), dtype),
        last_valid=jnp.zeros((cfg.num_beams,), bool),
        initialized=jnp.zeros((), bool),
    )


@partial(jax.jit, static_argnames=("cfg",))
def step(
    cfg: IcpConfig, state: FrameState, scan: Scan
) -> tuple[FrameState, IcpResult]:
    pts, valid = scan_to_points(scan)

    def first(_):
        return IcpResult(
            pose=jnp.zeros(3, pts.dtype),
            converged=jnp.zeros((), bool),
            mean_error=jnp.zeros((), pts.dtype),
        )

    def match(_):
        # reference direction: align LAST onto CURRENT (scan_match_icp.cc:135-147)
        return icp(cfg, state.last_pts, state.last_valid, pts, valid)

    res = jax.lax.cond(state.initialized, match, first, None)
    new_state = FrameState(
        last_pts=pts, last_valid=valid, initialized=jnp.ones((), bool)
    )
    return new_state, res
