"""Hector SLAM engine: multi-resolution scan-to-map GN SLAM, fully jitted.

The TPU-native re-design of lesson4's hector stack (reference:
lesson4/src/hector_mapping/hector_slam.cc,
.../slam_main/HectorSlamProcessor.h:54-149, .../slam_main/MapRepMultiMap.h).
Instead of a ROS node + mutex-guarded map objects + publish threads, the
engine is one pure step function over a pytree state:

    state' , info = step(state, scan_points, valid)

with the whole match + gated map update inside a single jit — zero per-scan
host round-trips.  Map update gating (pose moved > 0.4 m or 0.9 rad,
HectorSlamProcessor.h:101-107) uses ``lax.cond`` so ungated scans skip the
scatter work entirely.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core import se2
from tpuslam.core.config import HectorConfig
from tpuslam.core.grid import GridSpec
from tpuslam.core.scan import Scan, scan_to_points
from tpuslam.match.hector import MatchResult, match_pyramid
from tpuslam.ops.bilinear import prob_from_log_odds
from tpuslam.ops.logodds import update_grid

Array = jax.Array


class HectorState(NamedTuple):
    log_odds: tuple[Array, ...]  # per level, finest first, [H_i, W_i]
    pose: Array  # [3] world pose of the sensor
    last_update_pose: Array  # [3] pose at the last map update
    num_updates: Array  # int32 scalar


def make_specs(cfg: HectorConfig) -> tuple[GridSpec, ...]:
    """Pyramid of grids, finest first (MapRepMultiMap.h:57-90)."""
    specs = [
        GridSpec.centered(
            cfg.map_resolution, cfg.map_size, cfg.map_start_x,
            cfg.map_start_y,
        )
    ]
    for _ in range(1, cfg.map_multi_res_levels):
        specs.append(specs[-1].coarsen())
    return tuple(specs)


def init_state(cfg: HectorConfig, dtype=jnp.float32) -> HectorState:
    specs = make_specs(cfg)
    return HectorState(
        log_odds=tuple(jnp.zeros(s.shape, dtype=dtype) for s in specs),
        pose=jnp.zeros(3, dtype=dtype),
        last_update_pose=jnp.zeros(3, dtype=dtype),
        num_updates=jnp.zeros((), dtype=jnp.int32),
    )


def _ray_budget(cfg: HectorConfig, level: int) -> int:
    return max(32, cfg.ray_steps >> level)


@partial(jax.jit, static_argnames=("cfg", "map_without_matching"))
def step(
    cfg: HectorConfig,
    state: HectorState,
    scan: Scan,
    *,
    map_without_matching: bool = False,
) -> tuple[HectorState, MatchResult]:
    """Process one scan: match against the pyramid, then (gated) map update.

    Mirrors HectorSlamProcessor::update (HectorSlamProcessor.h:81-108).
    """
    specs = make_specs(cfg)
    pts, valid = scan_to_points(scan)
    # beam gating (hector_slam.cc:336-356): STRICT dist window, the
    # mounting-shadow filter (near points behind the laser, x < 0 and
    # dist^2 < 0.5, are skipped), and the independent use_max_scan_range
    # cap (default 20 m — "distant points jump too much")
    r2 = scan.ranges * scan.ranges
    valid = (
        valid
        & (scan.ranges > cfg.laser_min_dist)
        & (scan.ranges < cfg.laser_max_dist)
        & ~((pts[..., 0] < 0.0) & (r2 < 0.5))
        & (r2 <= cfg.use_max_scan_range * cfg.use_max_scan_range)
    )

    if map_without_matching:
        result = MatchResult(
            pose=state.pose,
            hessian=jnp.eye(3, dtype=state.pose.dtype),
            score=jnp.zeros((), state.pose.dtype),
        )
    else:
        prob_grids = tuple(prob_from_log_odds(lo) for lo in state.log_odds)
        result = match_pyramid(
            specs,
            prob_grids,
            pts,
            valid,
            state.pose,
            iterations_finest=cfg.iterations_finest,
            iterations_coarse=cfg.iterations_coarse,
            yaw_clamp=cfg.yaw_step_clamp,
            max_point_range=(
                min(cfg.laser_max_dist, cfg.use_max_scan_range)
                if cfg.matcher_impl == "mxu" else None
            ),
            compute_dtype=jnp.dtype(cfg.matcher_dtype),
        )

    pose = result.pose
    d = pose - state.last_update_pose
    moved = (
        (jnp.hypot(d[0], d[1]) > cfg.map_update_distance_thresh)
        | (jnp.abs(se2.wrap_angle(d[2])) > cfg.map_update_angle_thresh)
        | (state.num_updates == 0)
    )

    wpts = se2.transform_points(pose, pts)

    def do_update(grids: tuple[Array, ...]) -> tuple[Array, ...]:
        new = []
        for lvl, (spec, lo) in enumerate(zip(specs, grids)):
            new.append(
                update_grid(
                    spec,
                    lo,
                    spec.world_to_map(pose[:2]),
                    spec.world_to_map(wpts),
                    valid,
                    max_steps=_ray_budget(cfg, lvl),
                    update_free=cfg.update_factor_free,
                    update_occ=cfg.update_factor_occupied,
                )
            )
        return tuple(new)

    log_odds = jax.lax.cond(moved, do_update, lambda g: g, state.log_odds)
    new_state = HectorState(
        log_odds=log_odds,
        pose=pose,
        last_update_pose=jnp.where(moved, pose, state.last_update_pose),
        num_updates=state.num_updates + moved.astype(jnp.int32),
    )
    return new_state, result


@partial(jax.jit, static_argnames=("cfg",))
def run_trajectory(
    cfg: HectorConfig, state: HectorState, scans: Scan
) -> tuple[HectorState, Array]:
    """Scan-fold a whole trajectory on device; returns final state + poses.

    scans: Scan pytree with a leading time axis [T, ...].
    """

    def body(st, scan):
        st, res = step(cfg, st, scan)
        return st, res.pose

    return jax.lax.scan(body, state, scans)


def occupancy_image(state: HectorState, level: int = 0) -> Array:
    """Export a ROS-style int8 map: -1 unknown, 0 free, 100 occupied
    (reference export thresholds, hector GridMapBase getGridProbabilityMap
    usage in hector_slam.cc:268-301)."""
    lo = state.log_odds[level]
    out = jnp.full(lo.shape, -1, dtype=jnp.int8)
    out = jnp.where(lo > 0, jnp.int8(100), out)
    out = jnp.where(lo < 0, jnp.int8(0), out)
    return out
