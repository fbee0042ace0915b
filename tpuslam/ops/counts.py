"""Hit/visit counting grids (GMapping cell model) and pass/hit grids (karto).

GMapping's ``PointAccumulator`` cell (reference:
lesson4/include/lesson4/gmapping/grid/map.h:17-48): every beam crossing a
cell increments ``visits``; every endpoint hit increments both ``n`` and
``visits``; occupancy = n / visits, or -1 if never visited.  Unlike the
hector log-odds update there is NO per-scan dedup — multiplicity counts —
so the TPU formulation is a scatter-ADD of per-beam cell lists.

Karto's output grid (reference: Karto.h:5804-5968) shares the shape: raytrace
``pass`` counts (endpoint excluded for clipped beams) + endpoint ``hit``
counts, thresholded as occupied iff ``pass > min_pass_through`` and
``hit/pass > occupancy_threshold``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core.grid import GridSpec
from tpuslam.ops.raycast import ray_cells

Array = jax.Array


class CountGrid(NamedTuple):
    hits: Array  # [H, W] int32 — endpoint hits (gmapping `n`, karto `hit`)
    visits: Array  # [H, W] int32 — beam traversals (gmapping `visits`, karto `pass`)


def zero_counts(spec: GridSpec) -> CountGrid:
    z = jnp.zeros(spec.shape, dtype=jnp.int32)
    return CountGrid(hits=z, visits=z)


def accumulate_scan(
    spec: GridSpec,
    counts: CountGrid,
    origin_m: Array,
    endpoints_m: Array,
    free_only: Array,
    valid: Array,
    *,
    max_steps: int,
    trace_includes_endpoint: bool = False,
    canonical_lines: bool = False,
) -> CountGrid:
    """Scatter-add one scan's rays into the counters.

    origin_m: [2]; endpoints_m: [B, 2] (continuous map coords);
    free_only: [B] bool — beam clamped to max_use_range: trace free cells but
    record no hit (gmapping.cc:190-218 ``d == max_use_range_`` rule; karto
    clips beams beyond rangeThreshold the same way, Karto.h:5876-5888).
    valid: [B] bool.

    trace_includes_endpoint: karto's ``Grid::TraceLine`` visits BOTH
    endpoints inclusive (Karto.h:4711-4744 loops ``x0..x1``), so every
    in-grid beam — free-only or not — adds one pass at its endpoint cell,
    and a valid endpoint then adds one MORE pass plus a hit
    (``RayTrace``, Karto.h:5911-5943): endpoint totals are pass+=2, hit+=1.
    GMapping excludes the endpoint from the trace (gmapping.cc:206-217
    iterates ``line.num_points - 1``), the default here.
    """
    h, w = spec.shape
    starts = jnp.broadcast_to(origin_m, endpoints_m.shape)
    if canonical_lines:
        # gmapping's gridLineCore enumerates every line from the end with
        # the SMALLER major-axis coordinate (gridlinetraversal.h:27-180),
        # so Bresenham tie cells — exact half crossings, ubiquitous on
        # integer-to-integer lines — follow the canonical direction, not
        # the beam direction.  Walk swapped rays from the beam endpoint
        # and drop the walk START (= the beam endpoint cell) instead of
        # the walk end (gmapping.cc:206-217 excludes the endpoint).
        bx = jnp.floor(starts[..., 0] + 0.5).astype(jnp.int32)
        by = jnp.floor(starts[..., 1] + 0.5).astype(jnp.int32)
        ex0 = jnp.floor(endpoints_m[..., 0] + 0.5).astype(jnp.int32)
        ey0 = jnp.floor(endpoints_m[..., 1] + 0.5).astype(jnp.int32)
        dx, dy = ex0 - bx, ey0 - by
        x_major = jnp.abs(dx) >= jnp.abs(dy)
        swap = jnp.where(x_major, dx < 0, dy < 0)
        s3 = swap[..., None]
        ix, iy, m = ray_cells(
            jnp.where(s3, endpoints_m, starts),
            jnp.where(s3, starts, endpoints_m),
            max_steps,
            drop_start=swap,
        )
    else:
        ix, iy, m = ray_cells(starts, endpoints_m, max_steps)
    m = m & valid[..., None] & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    flat_free = jnp.where(m, iy * w + ix, h * w)

    ex = jnp.floor(endpoints_m[..., 0] + 0.5).astype(jnp.int32)
    ey = jnp.floor(endpoints_m[..., 1] + 0.5).astype(jnp.int32)
    end_in = (ex >= 0) & (ex < w) & (ey >= 0) & (ey < h)
    hit_ok = valid & ~free_only & end_in
    flat_hit = jnp.where(hit_ok, ey * w + ex, h * w)

    one = jnp.int32(1)
    visits = (
        counts.visits.reshape(-1)
        .at[flat_free.reshape(-1)]
        .add(one, mode="drop")
        .at[flat_hit.reshape(-1)]
        .add(one, mode="drop")
    )
    if trace_includes_endpoint:
        flat_end = jnp.where(valid & end_in, ey * w + ex, h * w)
        visits = visits.at[flat_end.reshape(-1)].add(one, mode="drop")
    hits = counts.hits.reshape(-1).at[flat_hit.reshape(-1)].add(one, mode="drop")
    return CountGrid(hits=hits.reshape(h, w), visits=visits.reshape(h, w))


def gmapping_occupancy(counts: CountGrid) -> Array:
    """occ = n/visits, -1 where unvisited (map.h:17-48)."""
    visited = counts.visits > 0
    occ = counts.hits.astype(jnp.float32) / jnp.maximum(counts.visits, 1)
    return jnp.where(visited, occ, -1.0)


def gmapping_export(counts: CountGrid, occ_thresh: float = 0.25) -> Array:
    """ROS int8 map: -1 unknown / 100 occupied / 0 free
    (gmapping.cc:147-157 export thresholds)."""
    occ = gmapping_occupancy(counts)
    out = jnp.full(occ.shape, -1, dtype=jnp.int8)
    out = jnp.where(occ > occ_thresh, jnp.int8(100), out)
    out = jnp.where((occ >= 0) & (occ <= occ_thresh), jnp.int8(0), out)
    return out


def karto_export(
    counts: CountGrid, *, min_pass_through: int = 2, occupancy_threshold: float = 0.1
) -> Array:
    """Karto CreateFromScans thresholds (Karto.h:5953-5968): occupied iff
    pass > min_pass_through and hit/pass > occupancy_threshold; unknown where
    pass <= min_pass_through."""
    passes = counts.visits
    ratio = counts.hits.astype(jnp.float32) / jnp.maximum(passes, 1)
    known = passes > min_pass_through
    occ = known & (ratio > occupancy_threshold)
    out = jnp.full(passes.shape, -1, dtype=jnp.int8)
    out = jnp.where(known & ~occ, jnp.int8(0), out)
    out = jnp.where(occ, jnp.int8(100), out)
    return out
