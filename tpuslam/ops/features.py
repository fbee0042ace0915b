"""LIO-SAM-style curvature corner extraction (lesson1).

Behavioral contract (reference: lesson1/src/feature_detection.cc):

- finite beams are compacted front-to-back preserving order (93-106),
- curvature ``c_i = (sum_{j in i±1..5} r_j - 10 r_i)^2`` over the compacted
  ranges (112-124), defined for i in [5, count-5),
- the compacted scan splits into 6 equal segments (139-150); each segment
  contributes up to 20 corners, chosen as the highest-curvature points with
  ``c > edge_threshold = 1.0`` (152-170, threshold set at 69),
- output is the sparse corner subset in original beam indexing (127-174).

TPU shape: the compaction is a stable argsort by validity (no dynamic
shapes); the 11-beam window sum is a cumsum stencil; per-segment selection
is ``num_segments`` static ``top_k`` calls over masked curvature.  Batches
go through ``vmap`` (`extract_features` handles leading batch dims).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core.config import FeatureConfig
from tpuslam.core.scan import Scan

Array = jax.Array


class FeatureResult(NamedTuple):
    corner_mask: Array  # [..., B] bool — corners, ORIGINAL beam indexing
    curvature: Array  # [..., B] float — curvature, original indexing (0 invalid)


def _extract_1d(cfg: FeatureConfig, r: Array, valid: Array) -> FeatureResult:
    n = r.shape[0]
    hw = cfg.curvature_halfwin

    # stable compaction permutation: valid beams first, original order kept
    order = jnp.argsort(~valid, stable=True)
    cr = jnp.take(r, order)
    cv = jnp.take(valid, order)
    nv = jnp.sum(valid)

    # window sum over 2*hw+1 beams via padded cumsum;
    # sum_{j != i} r_j - 2*hw*r_i  =  S - (2*hw+1)*r_i
    crp = jnp.pad(cr, (hw, hw))
    csum = jnp.concatenate([jnp.zeros(1, cr.dtype), jnp.cumsum(crp)])
    s = csum[2 * hw + 1 :] - csum[:n]
    c = (s - (2 * hw + 1) * cr) ** 2

    pos = jnp.arange(n)
    in_window = (pos >= hw) & (pos < nv - hw)
    c = jnp.where(in_window, c, 0.0)

    # 6 equal segments over the compacted valid prefix with the
    # reference's EXACT bounds (feature_detection.cc:141-146):
    # start_j = nv*j//6, end_j = nv*(j+1)//6 - 1 (inclusive), and a
    # degenerate segment (start >= end) contributes nothing.  A plain
    # pos*6//nv binning puts boundary beams in the wrong segment.
    eligible = in_window & (c > cfg.edge_threshold)

    corner_c = jnp.zeros(n, bool)
    for s_id in range(cfg.num_segments):
        start = (nv * s_id) // cfg.num_segments
        end = (nv * (s_id + 1)) // cfg.num_segments - 1
        member = (pos >= start) & (pos <= end) & (start < end)
        # the reference sorts [start, end) EXCLUSIVE of end and its pick
        # loop starts at the UNSORTED end element (feature_detection.cc:
        # 150-170): when above threshold it is picked FIRST (counting
        # toward the 20 cap) regardless of rank — force it to the top of
        # the selection; the remaining picks are the usual by-curvature
        # top-k of the sorted range
        scored = jnp.where(
            eligible & member,
            jnp.where(pos == end, jnp.inf, c),
            -jnp.inf,
        )
        top, idx = jax.lax.top_k(scored, cfg.max_corners_per_segment)
        corner_c = corner_c.at[idx].max(top > -jnp.inf)

    # scatter back to original beam indexing
    corner_mask = jnp.zeros(n, bool).at[order].set(corner_c & cv)
    curvature = jnp.zeros(n, c.dtype).at[order].set(c)
    return FeatureResult(corner_mask=corner_mask, curvature=curvature)


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(cfg: FeatureConfig, scan: Scan) -> FeatureResult:
    r, valid = scan.ranges, scan.valid
    fn = partial(_extract_1d, cfg)
    for _ in range(r.ndim - 1):
        fn = jax.vmap(fn)
    return fn(r, valid)


def corner_scan(scan: Scan, feats: FeatureResult) -> Scan:
    """Sparse corner republish: the reference emits a LaserScan whose
    non-corner beams are zeroed (feature_detection.cc:127-174)."""
    keep = feats.corner_mask & scan.valid
    return scan._replace(
        ranges=jnp.where(keep, scan.ranges, 0.0), valid=keep
    )
