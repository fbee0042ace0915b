"""Log-odds occupancy-grid update from a posed scan.

Hector-style grid semantics (reference: lesson4/.../map/GridMapLogOdds.h:
92-161, OccGridMapBase.h:118-168 + 220-330):

- free cells along each beam get ``log(p_free/(1-p_free))`` added
  (p_free = update_factor_free = 0.4 → negative increment),
- each beam endpoint cell gets ``log(p_occ/(1-p_occ))`` (p_occ = 0.9),
- within ONE scan a cell is updated at most once as free and at most once
  as occupied, and an endpoint hit **overrides** a free mark in the same
  scan (the reference's ``updateSetOccupied`` "unsets" a just-applied free
  update, OccGridMapBase.h:144-160 via updateIndex bookkeeping),
- occupied log-odds saturate at +50 (GridMapLogOdds.h:110-114).

TPU-native formulation: instead of per-cell updateIndex counters, build two
boolean per-scan masks with scatter-max (free cells from the fixed-budget
raycaster, occupied cells from endpoints), resolve occ-beats-free, then apply
one fused elementwise update to the whole grid.  All beams of the (batch of)
scan(s) land in one scatter — no sequential beam loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.core.grid import GridSpec
from tpuslam.ops.raycast import ray_cells

Array = jax.Array

LOG_ODDS_CAP = 50.0  # GridMapLogOdds.h:110-114


def log_odds_factor(p: float) -> float:
    import math

    return math.log(p / (1.0 - p))


def scan_cell_masks(
    spec: GridSpec,
    origin_m: Array,
    endpoints_m: Array,
    valid: Array,
    max_steps: int,
) -> tuple[Array, Array]:
    """Per-scan free/occupied cell masks (uint8 grids).

    origin_m:     [2] sensor position in continuous map coords.
    endpoints_m:  [B, 2] beam endpoints in continuous map coords.
    valid:        [B] beam mask.
    Returns (free_mask, occ_mask), each [H, W] in {0, 1}; occ beats free is
    NOT yet resolved here (callers combine).
    """
    h, w = spec.shape
    # reference cell rounding is an INT-CAST of (f + 0.5)
    # (OccGridMapBase.h:126-155): truncation toward zero, which equals
    # floor for positive coords but CLAMPS the (-1, -0.5) band to cell 0
    # at the map edge — cells are computed here with the exact cast and
    # handed to ray_cells as already-integral coords
    bx = (origin_m[..., 0] + 0.5).astype(jnp.int32)
    by = (origin_m[..., 1] + 0.5).astype(jnp.int32)
    ex = (endpoints_m[..., 0] + 0.5).astype(jnp.int32)
    ey = (endpoints_m[..., 1] + 0.5).astype(jnp.int32)
    begin_cells = jnp.broadcast_to(
        jnp.stack([bx, by], -1).astype(endpoints_m.dtype), endpoints_m.shape
    )
    end_cells = jnp.stack([ex, ey], -1).astype(endpoints_m.dtype)
    ix, iy, ray_mask = ray_cells(begin_cells, end_cells, max_steps)
    ray_mask = ray_mask & valid[..., None]
    # reference line semantics (OccGridMapBase.h:155-159 + 220-240): a
    # beam whose begin OR end cell is outside the map updates NOTHING
    # (whole-line cancellation, not per-cell clipping), and a beam whose
    # begin == end cell is skipped entirely (no occupied mark either)
    binb = (bx >= 0) & (bx < w) & (by >= 0) & (by < h)
    einb = (ex >= 0) & (ex < w) & (ey >= 0) & (ey < h)
    line_ok = binb & einb & ((ex != bx) | (ey != by))
    ray_mask = ray_mask & line_ok[..., None]
    flat_free = jnp.where(
        ray_mask, iy * w + ix, h * w
    )  # h*w = dropped sentinel

    flat_occ = jnp.where(line_ok & valid, ey * w + ex, h * w)

    zeros = jnp.zeros((h * w,), dtype=jnp.uint8)
    one = jnp.uint8(1)
    free = zeros.at[flat_free.reshape(-1)].max(one, mode="drop")
    occ = zeros.at[flat_occ.reshape(-1)].max(one, mode="drop")
    return free.reshape(h, w), occ.reshape(h, w)


def update_grid(
    spec: GridSpec,
    log_odds: Array,
    origin_m: Array,
    endpoints_m: Array,
    valid: Array,
    *,
    max_steps: int,
    update_free: float,
    update_occ: float,
) -> Array:
    """One scan's log-odds update (hector semantics, see module docstring).

    update_free/update_occ are the probability factors (0.4 / 0.9 defaults,
    hector_slam.cc:147-148); converted to log-odds increments here.
    """
    free, occ = scan_cell_masks(spec, origin_m, endpoints_m, valid, max_steps)
    occ_b = occ.astype(jnp.bool_)
    free_b = free.astype(jnp.bool_) & ~occ_b  # endpoint overrides free

    inc_free = log_odds_factor(update_free)
    inc_occ = log_odds_factor(update_occ)

    lo = log_odds
    lo = jnp.where(free_b, lo + inc_free, lo)
    # occupied update only applied below the saturation cap
    lo = jnp.where(occ_b & (lo < LOG_ODDS_CAP), lo + inc_occ, lo)
    return lo
