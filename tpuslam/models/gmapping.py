"""GMapping-style occupancy mapping engine (lesson4 gmapping node).

The reference node rebuilds a fresh hit/visit map from each single scan at
the origin pose (gmapping.cc:127-242).  This engine offers both that
single-scan behavior (``map_from_scan``) and the natural extension the
tutorial points toward — accumulation of posed scans into one persistent
counter grid (``step`` / ``map_from_scans``), which is also the karto output
grid builder (Karto.h:5659-5990) when exported with ``karto_export``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpuslam.core import se2
from tpuslam.core.config import GmappingConfig
from tpuslam.core.grid import GridSpec
from tpuslam.core.scan import Scan, scan_to_points
from tpuslam.ops.counts import (
    CountGrid,
    accumulate_scan,
    gmapping_export,
    zero_counts,
)

Array = jax.Array


def make_spec(cfg: GmappingConfig) -> GridSpec:
    size_x = int(round((cfg.xmax - cfg.xmin) / cfg.delta))
    size_y = int(round((cfg.ymax - cfg.ymin) / cfg.delta))
    return GridSpec(cfg.delta, size_x, size_y, cfg.xmin, cfg.ymin)


def init_counts(cfg: GmappingConfig) -> CountGrid:
    return zero_counts(make_spec(cfg))


@partial(jax.jit, static_argnames=("cfg",))
def step(
    cfg: GmappingConfig, counts: CountGrid, pose: Array, scan: Scan
) -> CountGrid:
    """Accumulate one posed scan (gmapping.cc:171-242 beam rules):

    - invalid / zero / > maxRange beams skipped,
    - beams clamped to maxUrange trace free space only (no hit),
    - otherwise free cells along the ray + a hit at the endpoint.
    """
    spec = make_spec(cfg)
    pts, valid = scan_to_points(scan)
    r = scan.ranges
    valid = valid & (r > 0.0) & (r <= cfg.maxRange)
    # hit only when d < maxUrange STRICTLY (gmapping.cc:211-218): a beam
    # landing exactly at the threshold — including every clamped beam —
    # marks free space only
    free_only = valid & (r >= cfg.maxUrange)
    # clamp clipped beams to maxUrange along the beam direction
    scale = jnp.where(free_only, cfg.maxUrange / jnp.maximum(r, 1e-9), 1.0)
    pts = pts * scale[..., None]

    wpts = se2.transform_points(pose, pts)
    return accumulate_scan(
        spec,
        counts,
        spec.world_to_map(pose[:2]),
        spec.world_to_map(wpts),
        free_only,
        valid,
        max_steps=cfg.ray_steps,
        canonical_lines=True,  # gridLineCore tie-cell semantics
    )


def map_from_scan(cfg: GmappingConfig, scan: Scan) -> Array:
    """Reference single-scan behavior: fresh map from one scan at the origin
    (gmapping.cc:127-168), exported as int8 ROS values."""
    counts = step(cfg, init_counts(cfg), jnp.zeros(3, jnp.float32), scan)
    return gmapping_export(counts, cfg.occ_thresh)


@partial(jax.jit, static_argnames=("cfg",))
def map_from_scans(cfg: GmappingConfig, poses: Array, scans: Scan) -> CountGrid:
    """Fold a whole posed-scan batch [T, ...] into one counter grid."""

    def body(counts, inp):
        pose, scan = inp
        return step(cfg, counts, pose, scan), None

    counts, _ = jax.lax.scan(body, init_counts(cfg), (poses, scans))
    return counts
