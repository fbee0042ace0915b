"""Curvature corner extraction vs an independent NumPy reimplementation."""

import numpy as np

from tpuslam.core.config import FeatureConfig
from tpuslam.core.scan import make_scan
from tpuslam.ops.features import corner_scan, extract_features

CFG = FeatureConfig()


def numpy_reference(ranges, cfg=CFG):
    """Straightforward port of the documented behavior (compaction,
    curvature window, 6-segment top-20 threshold pick)."""
    finite = np.isfinite(ranges) & (ranges > 0)
    comp_idx = np.nonzero(finite)[0]
    cr = ranges[comp_idx]
    nv = len(cr)
    hw = cfg.curvature_halfwin
    c = np.zeros(nv)
    for i in range(hw, nv - hw):
        s = cr[i - hw : i + hw + 1].sum() - (2 * hw + 1) * cr[i]
        c[i] = s * s
    corners = set()
    for s_id in range(cfg.num_segments):
        # reference bounds (feature_detection.cc:141-146): start = nv*j/6,
        # end = nv*(j+1)/6 - 1; degenerate (start >= end) segments skipped
        lo = nv * s_id // cfg.num_segments
        end = nv * (s_id + 1) // cfg.num_segments - 1
        if lo >= end:
            continue
        # the reference sorts [lo, end) EXCLUSIVE and its pick loop starts
        # at the UNSORTED end element, then walks the sorted range in
        # descending curvature, breaking past the cap (cc:150-170)
        order = sorted(range(lo, end), key=lambda i: -c[i])
        picked = 0
        for i in [end] + order:
            if not (hw <= i < nv - hw) or c[i] <= cfg.edge_threshold:
                continue
            picked += 1
            if picked > cfg.max_corners_per_segment:
                break
            corners.add(i)
    mask = np.zeros_like(ranges, dtype=bool)
    for i in corners:
        mask[comp_idx[i]] = True
    curv = np.zeros_like(ranges, dtype=float)
    curv[comp_idx] = c
    return mask, curv


def test_matches_numpy_reference():
    rng = np.random.default_rng(3)
    n = 240
    ranges = 4.0 + 0.05 * rng.standard_normal(n)
    # corners: sharp range discontinuities
    ranges[60:90] = 2.0
    ranges[150:170] = 7.0
    # some invalid beams
    ranges[10:15] = np.nan
    ranges[200] = np.inf

    sc = make_scan(ranges, angle_min=-np.pi, angle_increment=2 * np.pi / n,
                   range_min=0.1, range_max=30.0)
    got = extract_features(CFG, sc)
    want_mask, want_curv = numpy_reference(np.nan_to_num(ranges, posinf=0.0))

    got_mask = np.asarray(got.corner_mask)
    got_curv = np.asarray(got.curvature)
    assert np.allclose(got_curv, want_curv, rtol=1e-4, atol=1e-3)
    assert (got_mask == want_mask).all(), np.nonzero(got_mask != want_mask)


def test_segment_cap():
    # a scan where EVERY point has huge curvature: each segment caps at 20
    n = 600
    ranges = 3.0 + 2.0 * (np.arange(n) % 2)
    sc = make_scan(ranges, angle_min=0.0, angle_increment=0.01)
    got = extract_features(CFG, sc)
    assert int(np.asarray(got.corner_mask).sum()) <= 6 * 20


def test_flat_scan_no_corners():
    sc = make_scan(np.full(300, 5.0), angle_min=0.0, angle_increment=0.01)
    got = extract_features(CFG, sc)
    assert int(np.asarray(got.corner_mask).sum()) == 0


def test_corner_scan_sparse():
    n = 240
    ranges = 4.0 + np.zeros(n)
    ranges[100:120] = 1.5
    sc = make_scan(ranges, angle_min=0.0, angle_increment=0.01)
    feats = extract_features(CFG, sc)
    sparse = corner_scan(sc, feats)
    nvalid = int(np.asarray(sparse.valid).sum())
    assert 0 < nvalid <= 6 * 20
    assert (np.asarray(sparse.ranges)[~np.asarray(sparse.valid)] == 0).all()


def test_batched():
    import jax.numpy as jnp

    n = 120
    r = np.tile(4.0 + np.zeros(n), (3, 1))
    r[:, 50:60] = 1.0
    sc = make_scan(r, angle_min=0.0, angle_increment=0.01)
    got = extract_features(CFG, sc)
    assert got.corner_mask.shape == (3, n)
    assert (np.asarray(got.corner_mask).sum(axis=1) > 0).all()


def test_unsorted_end_element_picked_first_when_saturated():
    """feature_detection.cc:150-170 sorts [start, end) EXCLUSIVE of the
    segment end and processes the UNSORTED end element first — when a
    segment saturates its 20-corner cap, the end beam is picked even if
    its curvature is not among the segment's top 20."""
    n = 600
    rng = np.random.default_rng(9)
    # alternate ranges: every interior beam has large curvature (all
    # segments saturate); add noise so curvatures are distinct
    ranges = 3.0 + 2.0 * (np.arange(n) % 2) + 0.01 * rng.random(n)
    sc = make_scan(ranges, angle_min=0.0, angle_increment=0.01)
    got = extract_features(CFG, sc)
    mask = np.asarray(got.corner_mask)
    curv = np.asarray(got.curvature)
    want_mask, want_curv = numpy_reference(ranges, CFG)
    assert np.array_equal(mask, want_mask)
    # the rule is actually exercised: some segment-end beam is picked
    # whose curvature ranks below its segment's cap-th largest
    nv = n  # all beams valid here
    exercised = False
    for s_id in range(CFG.num_segments):
        lo = nv * s_id // CFG.num_segments
        end = nv * (s_id + 1) // CFG.num_segments - 1
        seg = curv[lo:end]
        kth = np.sort(seg)[-CFG.max_corners_per_segment]
        if mask[end] and curv[end] < kth:
            exercised = True
    assert exercised
