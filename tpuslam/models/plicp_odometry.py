"""PL-ICP keyframe laser odometry (lesson3 ``plicp_odometry`` node).

Behavioral contract (reference: lesson3/src/plicp_odometry.cc):

- constant-velocity motion prediction over dt (GetPrediction, 442-456),
- the prediction is composed into the LASER frame through the base↔laser
  extrinsic chain ``laser_to_base · base_in_odom⁻¹ · pred · base_in_odom ·
  base_to_laser`` (356-370) — with a static extrinsic this reduces to
  ``b2l⁻¹ ∘ rel_base ∘ b2l``,
- PL-ICP matches the current scan against the KEYFRAME scan (391),
- pose composition ``base_in_odom = keyframe_pose ∘ corr_ch`` (399-413),
- keyframe replacement when |Δyaw| > kf_dist_angular, every kf_scan_count
  scans, or |Δt|² > kf_dist_linear² (NewKeyframeNeeded, 498-517),
- an invalid match leaves the pose at the prediction with a warning state
  (399-417) — here a ``valid`` flag in the step info.

Everything is one jitted step; the keyframe swap is a ``jnp.where`` over
fixed-shape keyframe buffers (no dynamic allocation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core import se2
from tpuslam.core.config import PlicpConfig
from tpuslam.core.scan import Scan, scan_to_points
from tpuslam.match.plicp import PlicpResult, plicp

Array = jax.Array


class OdomState(NamedTuple):
    keyframe_pts: Array  # [B, 2] keyframe scan in laser frame
    keyframe_valid: Array  # [B]
    keyframe_pose: Array  # [3] base_in_odom at keyframe time
    base_in_odom: Array  # [3] current base pose
    velocity: Array  # [3] twist estimate per second (vx, vy, w)
    scans_since_keyframe: Array  # int32
    initialized: Array  # bool


def init_state(cfg: PlicpConfig, dtype=jnp.float32) -> OdomState:
    b = cfg.num_beams
    return OdomState(
        keyframe_pts=jnp.zeros((b, 2), dtype),
        keyframe_valid=jnp.zeros((b,), bool),
        keyframe_pose=jnp.zeros(3, dtype),
        base_in_odom=jnp.zeros(3, dtype),
        velocity=jnp.zeros(3, dtype),
        scans_since_keyframe=jnp.zeros((), jnp.int32),
        initialized=jnp.zeros((), bool),
    )


class StepInfo(NamedTuple):
    pose: Array  # [3] base_in_odom after the step
    match_valid: Array
    new_keyframe: Array
    mean_error: Array
    # [3, 3] match covariance in the LASER frame (sigma^2 inv(J^T W J),
    # match/plicp.py; identity unless cfg.do_compute_covariance) — lets
    # PL-ICP odometry edges feed the pose-graph solver with honest weights
    covariance: Array


@partial(jax.jit, static_argnames=("cfg",))
def step(
    cfg: PlicpConfig,
    state: OdomState,
    scan: Scan,
    dt: Array | float = 0.1,
    base_to_laser: Array | None = None,
) -> tuple[OdomState, StepInfo]:
    dt = jnp.asarray(dt, state.base_in_odom.dtype)
    if base_to_laser is None:
        base_to_laser = jnp.zeros(3, state.base_in_odom.dtype)
    pts, valid = scan_to_points(scan)

    # ---- first scan: becomes the keyframe, pose stays identity (196-212)
    def first(_):
        st = state._replace(
            keyframe_pts=pts,
            keyframe_valid=valid,
            keyframe_pose=state.base_in_odom,
            scans_since_keyframe=jnp.zeros((), jnp.int32),
            initialized=jnp.ones((), bool),
        )
        info = StepInfo(
            pose=state.base_in_odom,
            match_valid=jnp.ones((), bool),
            new_keyframe=jnp.ones((), bool),
            mean_error=jnp.zeros((), pts.dtype),
            covariance=jnp.eye(3, dtype=pts.dtype),
        )
        return st, info

    # ---- regular scan: predict, match, compose, maybe re-key (327-436)
    def regular(_):
        pred = se2.exp(state.velocity * dt)  # constant-velocity prediction
        pred_base = se2.compose(state.base_in_odom, pred)
        rel_base = se2.relative(state.keyframe_pose, pred_base)
        guess_l = se2.compose(
            se2.inverse(base_to_laser), se2.compose(rel_base, base_to_laser)
        )

        res: PlicpResult = plicp(
            cfg, pts, valid, state.keyframe_pts, state.keyframe_valid, guess_l
        )
        corr_base = se2.compose(
            base_to_laser, se2.compose(res.pose, se2.inverse(base_to_laser))
        )
        new_pose = se2.compose(state.keyframe_pose, corr_base)
        new_pose = jnp.where(res.valid, new_pose, pred_base)

        motion = se2.relative(state.base_in_odom, new_pose)
        vel = se2.log(motion) / jnp.maximum(dt, 1e-6)

        d = se2.relative(state.keyframe_pose, new_pose)
        count = state.scans_since_keyframe + 1
        need_kf = (
            (jnp.abs(d[2]) > cfg.kf_dist_angular)
            | (count > cfg.kf_scan_count)
            | (d[0] ** 2 + d[1] ** 2 > cfg.kf_dist_linear**2)
        )

        st = OdomState(
            keyframe_pts=jnp.where(need_kf, pts, state.keyframe_pts),
            keyframe_valid=jnp.where(need_kf, valid, state.keyframe_valid),
            keyframe_pose=jnp.where(need_kf, new_pose, state.keyframe_pose),
            base_in_odom=new_pose,
            velocity=vel,
            scans_since_keyframe=jnp.where(need_kf, 0, count),
            initialized=jnp.ones((), bool),
        )
        info = StepInfo(
            pose=new_pose,
            match_valid=res.valid,
            new_keyframe=need_kf,
            mean_error=res.mean_error,
            covariance=res.covariance,
        )
        return st, info

    return jax.lax.cond(state.initialized, regular, first, None)


@partial(jax.jit, static_argnames=("cfg",))
def run_trajectory(
    cfg: PlicpConfig, state: OdomState, scans: Scan, dts: Array
) -> tuple[OdomState, Array]:
    """Fold a scan stream [T, ...]; returns final state + poses [T, 3]."""

    def body(st, inp):
        scan, dt = inp
        st, info = step(cfg, st, scan, dt)
        return st, info.pose

    return jax.lax.scan(body, state, (scans, dts))
