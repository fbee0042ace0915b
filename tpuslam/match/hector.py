"""Hector-style scan-to-map Gauss-Newton matcher + multi-resolution pyramid.

Behavioral contract (reference: lesson4/.../matcher/ScanMatcher.h:60-139,
slam_main/MapRepMultiMap.h:57-167):

- One GN iteration accumulates, over all valid beams, the 3x3 normal system
  ``H = sum J^T J`` and rhs ``dTr = sum J^T r`` with residual ``r = 1 - M(Pm)``
  where ``M`` is the bilinearly-interpolated occupancy probability at the
  transformed point ``Pm = R(theta) p + t`` (all in map-cell units), and
  Jacobian row ``J = [Mx, My, (-sin·px - cos·py)·Mx + (cos·px - sin·py)·My]``
  (OccGridMapUtil.h:77-132).
- Step ``delta = H^-1 dTr`` with the yaw component clamped to ±0.2 rad
  (ScanMatcher.h:117-137); singular H leaves the pose unchanged.
- Coarse-to-fine: levels from coarsest to finest, 3 iterations per coarse
  level and 5 at the finest; level i sees the scan scaled by 1/2^i
  (MapRepMultiMap.h:144-167).  The returned "covariance" is the final
  finest-level H, as in the reference (ScanMatcher.h:85-93).

TPU-native shape: the per-beam loop is one vectorized gather+reduce; the GN
iterations are a ``lax.scan``; whole scan batches go through ``vmap``.  All
arithmetic is float32 (the 3x3 solve is tiny and well-conditioned after the
epsilon guard).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from tpuslam.core.grid import GridSpec
from tpuslam.ops.bilinear import interp_value_grad

Array = jax.Array


class MatchResult(NamedTuple):
    pose: Array  # [..., 3] matched pose (same frame as the input pose)
    hessian: Array  # [..., 3, 3] final GN normal matrix (reference "covariance")
    score: Array  # [...] mean map value at matched points (diagnostic)


def gn_system(
    prob_grid: Array, pts: Array, valid: Array, pose_map: Array
) -> tuple[Array, Array, Array]:
    """Build (H, dTr, mean_value) for one GN iteration.

    pts: [B, 2] scan points in map-cell units (sensor frame).
    pose_map: [3] pose in map coords (x, y cells, theta rad).
    """
    c, s = jnp.cos(pose_map[2]), jnp.sin(pose_map[2])
    px, py = pts[..., 0], pts[..., 1]
    tx = c * px - s * py + pose_map[0]
    ty = s * px + c * py + pose_map[1]
    mpts = jnp.stack([tx, ty], axis=-1)

    val, grad, inb = interp_value_grad(prob_grid, mpts, valid)
    mx, my = grad[..., 0], grad[..., 1]
    rot = (-s * px - c * py) * mx + (c * px - s * py) * my

    r = jnp.where(inb, 1.0 - val, 0.0)
    j = jnp.stack([mx, my, rot], axis=-1)  # [B, 3]

    h = jnp.einsum("bi,bj->ij", j, j)
    dtr = jnp.einsum("bi,b->i", j, r)
    n = jnp.maximum(jnp.sum(valid), 1)
    return h, dtr, jnp.sum(jnp.where(inb, val, 0.0)) / n


def _solve3(h: Array, dtr: Array) -> tuple[Array, Array]:
    """delta = H^-1 dTr via adjugate; returns (delta, ok)."""
    a, b, c = h[0, 0], h[0, 1], h[0, 2]
    d, e, f = h[1, 1], h[1, 2], h[2, 2]
    det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    ok = jnp.abs(det) > 1e-12
    det_safe = jnp.where(ok, det, 1.0)
    inv = (
        jnp.stack(
            [
                d * f - e * e,
                c * e - b * f,
                b * e - c * d,
                c * e - b * f,
                a * f - c * c,
                b * c - a * e,
                b * e - c * d,
                b * c - a * e,
                a * d - b * b,
            ]
        ).reshape(3, 3)
        / det_safe
    )
    delta = inv @ dtr
    return jnp.where(ok, delta, jnp.zeros(3, h.dtype)), ok


def gn_system_mxu(
    crop: Array,
    crop_origin: Array,
    compute_dtype,
    pts: Array,
    valid: Array,
    pose_map: Array,
) -> tuple[Array, Array, Array]:
    """Same normal system as gn_system, but sampling on the MXU via
    fractional one-hot matmuls over a pose-centered crop (ops/mxu_interp.py).
    compute_dtype=float32 is numerically identical to the gather path for
    points inside the crop window; bfloat16 trades ~3e-3 of probability
    resolution for ~4x matmul rate (the GN optimum is unchanged in practice
    — see tests/test_hector.py trajectory tolerances)."""
    from tpuslam.ops.mxu_interp import interp_value_grad_mxu

    c, s = jnp.cos(pose_map[2]), jnp.sin(pose_map[2])
    px, py = pts[..., 0], pts[..., 1]
    tx = c * px - s * py + pose_map[0] - crop_origin[0]
    ty = s * px + c * py + pose_map[1] - crop_origin[1]
    mpts = jnp.stack([tx, ty], axis=-1)

    val, grad, inb = interp_value_grad_mxu(
        crop, mpts, valid, compute_dtype=compute_dtype
    )
    mx, my = grad[..., 0], grad[..., 1]
    rot = (-s * px - c * py) * mx + (c * px - s * py) * my

    r = jnp.where(inb, 1.0 - val, 0.0)
    j = jnp.stack([mx, my, rot], axis=-1)
    h = jnp.einsum("bi,bj->ij", j, j)
    dtr = jnp.einsum("bi,b->i", j, r)
    n = jnp.maximum(jnp.sum(valid), 1)
    return h, dtr, jnp.sum(jnp.where(inb, val, 0.0)) / n


def match_level(
    prob_grid: Array,
    pts: Array,
    valid: Array,
    pose_map: Array,
    *,
    num_iters: int,
    yaw_clamp: float = 0.2,
    window: int | None = None,
    compute_dtype=jnp.float32,
) -> tuple[Array, Array, Array]:
    """Fixed-count GN iterations against one pyramid level (map coords).

    With ``window`` set, sampling runs on the MXU against a crop of that many
    cells centered on the initial pose (the fast path); otherwise the gather
    formulation samples the full grid."""
    if window is not None and window < min(prob_grid.shape):
        from tpuslam.ops.mxu_interp import crop_grid

        crop, origin = crop_grid(prob_grid, pose_map[:2], window)
        sample = partial(gn_system_mxu, crop, origin, compute_dtype)
    elif window is not None:
        sample = partial(
            gn_system_mxu, prob_grid, jnp.zeros(2, pose_map.dtype), compute_dtype
        )
    else:
        sample = partial(gn_system, prob_grid)

    def body(pose, _):
        h, dtr, score = sample(pts, valid, pose)
        delta, ok = _solve3(h, dtr)
        dth = jnp.clip(delta[2], -yaw_clamp, yaw_clamp)  # ScanMatcher.h:128-133
        new_pose = pose + jnp.stack([delta[0], delta[1], dth])
        new_pose = jnp.where(ok, new_pose, pose)
        return new_pose, (h, score)

    pose, (hs, scores) = jax.lax.scan(
        body, pose_map, None, length=num_iters
    )
    return pose, hs[-1], scores[-1]


def match_pyramid(
    specs: Sequence[GridSpec],
    prob_grids: Sequence[Array],
    pts_base: Array,
    valid: Array,
    pose_world: Array,
    *,
    iterations_finest: int = 5,
    iterations_coarse: int = 3,
    yaw_clamp: float = 0.2,
    max_point_range: float | None = None,
    compute_dtype=jnp.float32,
) -> MatchResult:
    """Coarse-to-fine match; level 0 is finest (MapRepMultiMap.h:144-167).

    pts_base: [B, 2] scan points in **meters** (sensor frame).
    pose_world: [3] initial pose in world frame.
    max_point_range: when set (meters), each level samples through an
    MXU-friendly crop window of ``2*max_point_range/res + margin`` cells —
    the fast path; beams must be range-gated to this distance.
    """
    n_levels = len(specs)
    pose = pose_world
    hessian = jnp.eye(3, dtype=pose.dtype)
    score = jnp.zeros((), dtype=pose.dtype)
    for lvl in range(n_levels - 1, -1, -1):
        spec = specs[lvl]
        pts_map = pts_base / spec.resolution  # DataPointContainer.h:46-58 scale
        pose_map = spec.world_pose_to_map(pose)
        iters = iterations_finest if lvl == 0 else iterations_coarse
        window = None
        if max_point_range is not None:
            from tpuslam.ops.mxu_interp import round_up

            # 32-cell slack for pose motion across GN iterations (the crop
            # is anchored at the initial pose); e.g. 12 m range at 5 cm
            # lands exactly on a 512-wide window
            need = int(2.0 * max_point_range / spec.resolution) + 32
            window = min(round_up(need, 128), round_up(min(spec.shape), 128))
        pose_map, hessian, score = match_level(
            prob_grids[lvl],
            pts_map,
            valid,
            pose_map,
            num_iters=iters,
            yaw_clamp=yaw_clamp,
            window=window,
            compute_dtype=compute_dtype,
        )
        pose = spec.map_pose_to_world(pose_map)
    return MatchResult(pose=pose, hessian=hessian, score=score)


def pyramid_hw_flops(
    specs: Sequence[GridSpec],
    num_beams: int,
    *,
    iterations_finest: int = 5,
    iterations_coarse: int = 3,
    max_point_range: float | None = None,
) -> int:
    """HARDWARE FLOPs of one full pyramid match on the MXU one-hot path.

    Counts the systolic-array work actually executed: per GN iteration two
    [B, Hc] @ [Hc, Wc] contractions (value and d/dy one-hot rows against
    the crop), 2*B*Hc*Wc FLOPs each, with the crop windows derived
    exactly as :func:`match_pyramid` derives them.  This is the roofline-
    utilization numerator; it deliberately differs from XLA's cost-model
    "model FLOPs" (the mfu_pct_* fields), which count the algorithmically
    necessary math — the one-hot formulation trades ~6x redundant MXU
    FLOPs for avoiding TPU gathers, so hardware utilization can sit near
    peak while model-MFU reads ~15%.  Both are correct under their own
    FLOP model; benchmarks record both."""
    from tpuslam.ops.mxu_interp import round_up

    total = 0
    for lvl, spec in enumerate(specs):
        iters = iterations_finest if lvl == 0 else iterations_coarse
        h, w = spec.shape
        hc, wc = h, w
        if max_point_range is not None:
            need = int(2.0 * max_point_range / spec.resolution) + 32
            window = min(round_up(need, 128), round_up(min(spec.shape), 128))
            hc, wc = min(window, h), min(window, w)
        total += iters * 2 * (2 * num_beams * hc * wc)
    return total


def match_pyramid_batched(
    specs: Sequence[GridSpec],
    prob_grids: Sequence[Array],
    pts_base: Array,  # [S, B, 2] meters, sensor frame
    valid: Array,  # [S, B]
    poses_world: Array,  # [S, 3]
    *,
    iterations_finest: int = 5,
    iterations_coarse: int = 3,
    yaw_clamp: float = 0.2,
    max_point_range: float | None = None,
    compute_dtype=jnp.float32,
    impl: str = "mxu",
) -> MatchResult:
    """Whole-batch coarse-to-fine matching.

    impl="pallas" routes the FINEST level through the fused TPU kernel
    (ops/pallas_hector.py: crop resident in VMEM across the GN iterations —
    where the crop re-fetch dominates) and the coarse levels through the XLA
    MXU path (their alignment-padded windows would negate the kernel's win);
    "mxu"/"gather" vmap the per-scan ``match_pyramid`` throughout.
    """
    if impl != "pallas":
        fn = jax.vmap(
            lambda p, v, g: match_pyramid(
                specs, prob_grids, p, v, g,
                iterations_finest=iterations_finest,
                iterations_coarse=iterations_coarse,
                yaw_clamp=yaw_clamp,
                max_point_range=(
                    max_point_range if impl == "mxu" else None
                ),
                compute_dtype=compute_dtype,
            )
        )
        return fn(pts_base, valid, poses_world)

    from tpuslam.ops.mxu_interp import round_up
    from tpuslam.ops.pallas_hector import match_level_pallas

    if max_point_range is None:
        raise ValueError("impl='pallas' requires max_point_range")
    n_levels = len(specs)
    poses = poses_world
    hess = jnp.tile(jnp.eye(3, dtype=poses.dtype), (poses.shape[0], 1, 1))
    scores = jnp.zeros((poses.shape[0],), poses.dtype)
    for lvl in range(n_levels - 1, -1, -1):
        spec = specs[lvl]
        pts_map = pts_base / spec.resolution
        poses_map = spec.world_pose_to_map(poses)
        iters = iterations_finest if lvl == 0 else iterations_coarse
        if lvl == 0:
            # +64 pose-drift slack (crop anchored at the initial pose)
            # +256 alignment slack: the kernel aligns the crop origin DOWN
            # to the (8, 128) DMA tile, which shrinks the +x margin by up
            # to 127 cells — the window must guarantee margin >= R + drift
            # on BOTH sides after the shift (window//2 - 127 >= R + 32),
            # or beams near max range in the +x direction silently drop
            # out of the GN fit
            need = int(2.0 * max_point_range / spec.resolution) + 64 + 256
            window = min(round_up(need, 128), round_up(min(spec.shape), 128))
            poses_map, hess, scores = match_level_pallas(
                prob_grids[lvl], pts_map, valid, poses_map,
                window=window, num_iters=iters, yaw_clamp=yaw_clamp,
            )
        else:
            need = int(2.0 * max_point_range / spec.resolution) + 64
            window = min(round_up(need, 128), round_up(min(spec.shape), 128))
            poses_map, hess, scores = jax.vmap(
                lambda p, v, g: match_level(
                    prob_grids[lvl], p, v, g, num_iters=iters,
                    yaw_clamp=yaw_clamp, window=window,
                    compute_dtype=compute_dtype,
                )
            )(pts_map, valid, poses_map)
        poses = spec.map_pose_to_world(poses_map)
    return MatchResult(pose=poses, hessian=hess, score=scores)
