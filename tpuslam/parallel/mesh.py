"""Multi-chip scaling: shard batched SLAM work over a device mesh.

The reference is single-process ROS (SURVEY.md §2.3: no collectives of any
kind exist there); the TPU-native scaling axis is **batch-of-scans** — many
scans matched against a shared map at once (multi-robot / offline-bag
throughput, the BASELINE.json north star).  Design: scans are sharded over
the ``scan`` mesh axis, grids are replicated; matching is embarrassingly
parallel; the joint map update combines per-shard free/occupied cell masks
with a ``max`` all-reduce (boolean OR), which rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.core import se2
from tpuslam.core.config import HectorConfig
from tpuslam.core.scan import Scan, scan_to_points
from tpuslam.match.hector import match_pyramid
from tpuslam.models.hector_slam import HectorState, _ray_budget, make_specs
from tpuslam.ops.bilinear import prob_from_log_odds
from tpuslam.ops.logodds import LOG_ODDS_CAP, log_odds_factor, scan_cell_masks

Array = jax.Array


def make_mesh(n_devices: int | None = None, axis: str = "scan") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}) needs {n} devices but the backend exposes "
            f"{len(devs)}; force a virtual CPU platform with "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n} (before JAX backend init)"
        )
    return Mesh(devs[:n], (axis,))


def batch_match(
    cfg: HectorConfig, state: HectorState, scans: Scan
) -> tuple[Array, Array]:
    """Match a batch of scans [N, B] against the shared map.

    Returns (poses [N, 3], scores [N]).  Initial guesses are the scans'
    stamps-free prior: the current state pose (callers can vmap-carry their
    own priors by pre-composing into the scan points)."""
    specs = make_specs(cfg)
    prob_grids = tuple(prob_from_log_odds(lo) for lo in state.log_odds)
    pts, valid = scan_to_points(scans)
    valid = (
        valid
        & (scans.ranges >= cfg.laser_min_dist)
        & (scans.ranges <= cfg.laser_max_dist)
    )

    def one(p, v):
        res = match_pyramid(
            specs,
            prob_grids,
            p,
            v,
            state.pose,
            iterations_finest=cfg.iterations_finest,
            iterations_coarse=cfg.iterations_coarse,
            yaw_clamp=cfg.yaw_step_clamp,
            max_point_range=(
                cfg.laser_max_dist if cfg.matcher_impl == "mxu" else None
            ),
            compute_dtype=jnp.dtype(cfg.matcher_dtype),
        )
        return res.pose, res.score

    return jax.vmap(one)(pts, valid)


def batch_step(
    cfg: HectorConfig, state: HectorState, scans: Scan
) -> tuple[HectorState, Array]:
    """One sharded multi-scan step: match every scan, then one joint map
    update from all matched scans (each cell still updated at most once —
    the per-scan dedup semantics extend naturally to the joint batch)."""
    specs = make_specs(cfg)
    poses, _ = batch_match(cfg, state, scans)

    pts, valid = scan_to_points(scans)
    valid = (
        valid
        & (scans.ranges >= cfg.laser_min_dist)
        & (scans.ranges <= cfg.laser_max_dist)
    )
    wpts = se2.transform_points(poses, pts)  # [N, B, 2]

    new_grids = []
    for lvl, (spec, lo) in enumerate(zip(specs, state.log_odds)):
        free, occ = jax.vmap(
            lambda wp, v, ps: scan_cell_masks(
                spec,
                spec.world_to_map(ps[:2]),
                spec.world_to_map(wp),
                v,
                _ray_budget(cfg, lvl),
            )
        )(wpts, valid, poses)
        free = jnp.max(free, axis=0)  # OR across the batch (all-reduce on mesh)
        occ = jnp.max(occ, axis=0)
        occ_b = occ.astype(jnp.bool_)
        free_b = free.astype(jnp.bool_) & ~occ_b
        lo = jnp.where(free_b, lo + log_odds_factor(cfg.update_factor_free), lo)
        lo = jnp.where(
            occ_b & (lo < LOG_ODDS_CAP),
            lo + log_odds_factor(cfg.update_factor_occupied),
            lo,
        )
        new_grids.append(lo)

    mean_pose = jnp.concatenate(
        [
            jnp.mean(poses[:, :2], axis=0),
            jnp.arctan2(
                jnp.mean(jnp.sin(poses[:, 2])), jnp.mean(jnp.cos(poses[:, 2]))
            )[None],
        ]
    )
    new_state = HectorState(
        log_odds=tuple(new_grids),
        pose=mean_pose,
        last_update_pose=mean_pose,
        num_updates=state.num_updates + 1,
    )
    return new_state, poses


def make_mesh_2d(
    n_devices: int | None = None,
    scan_axis: int | None = None,
    axes: tuple[str, str] = ("scan", "beam"),
) -> Mesh:
    """2-D mesh: data-parallel over scans x model-parallel over beams.

    Sharding the beam axis splits each scan's GN reductions (H, dTr sums)
    across devices — XLA inserts the psum over ICI.  ``scan_axis`` defaults
    to n_devices // 2."""
    import numpy as _np

    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh_2d({n}) needs {n} devices but the backend exposes "
            f"{len(devs)}; force a virtual CPU platform with "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n} (before JAX backend init)"
        )
    sa = scan_axis or max(1, n // 2)
    if n % sa != 0:
        raise ValueError(f"scan_axis={sa} does not divide n_devices={n}")
    return Mesh(_np.asarray(devs[:n]).reshape(sa, n // sa), axes)


def sharded_batch_step(cfg: HectorConfig, mesh: Mesh, axis: str = "scan"):
    """jit ``batch_step`` with scans sharded over the mesh and state
    replicated; XLA inserts the mask all-reduces over ICI.

    With a 2-D mesh from :func:`make_mesh_2d`, the beam axis of every scan
    additionally shards over the second mesh axis (sequence-parallel
    flavor): the per-scan GN normal-system reductions become psums."""
    beam = "beam" if "beam" in mesh.axis_names else None
    scan_sharding = Scan(
        ranges=NamedSharding(mesh, P(axis, beam)),
        angles=NamedSharding(mesh, P(axis, beam)),
        valid=NamedSharding(mesh, P(axis, beam)),
        stamps=NamedSharding(mesh, P(axis, beam)),
    )
    state_sharding = HectorState(
        log_odds=tuple(
            NamedSharding(mesh, P()) for _ in range(cfg.map_multi_res_levels)
        ),
        pose=NamedSharding(mesh, P()),
        last_update_pose=NamedSharding(mesh, P()),
        num_updates=NamedSharding(mesh, P()),
    )
    return jax.jit(
        partial(batch_step, cfg),
        in_shardings=(state_sharding, scan_sharding),
        out_shardings=(state_sharding, NamedSharding(mesh, P(axis))),
    )
