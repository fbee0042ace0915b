"""Pallas correlative response kernel vs the patch/FFT paths.

The kernel (tpuslam/ops/pallas_correlative.py) computes the summed S x S
patches per candidate angle with the correlation grid resident in VMEM;
on CPU it runs in interpreter mode.  Grid values are multiples of 0.01,
so all paths must agree bit-exactly after the x100 integer rounding.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpuslam.core import se2
from tpuslam.core.scan import make_scan, scan_to_points
from tpuslam.io.simulate import simulate_scan, world_with_boxes
from tpuslam.match.correlative import CorrelativeSpec, match_scan
from tpuslam.ops.pallas_correlative import patch_sums_pallas, vmem_fits

SEGS = world_with_boxes()
SPEC = CorrelativeSpec(
    resolution=0.05,
    search_dim=0.3,
    smear_deviation=0.03,
    range_threshold=6.0,
)


def _numpy_patch_sums(grid, ay, ax, s):
    # zero landing strip past row/col g, matching the kernel's padding
    g = grid.shape[0]
    big = np.zeros((g + s + 8, g + s + 128), np.float32)
    big[:g, :g] = np.round(grid * 100.0)
    n_a, b = ay.shape
    out = np.zeros((n_a, s, s), np.float32)
    for a in range(n_a):
        for p in range(b):
            out[a] += big[ay[a, p] : ay[a, p] + s, ax[a, p] : ax[a, p] + s]
    return out


def test_patch_sums_matches_numpy():
    rng = np.random.default_rng(0)
    g, s, n_a, b = 64, 7, 5, 40
    grid = rng.integers(0, 101, (g, g)).astype(np.float32) / 100.0
    ay = rng.integers(0, g - s + 1, (n_a, b)).astype(np.int32)
    ax = rng.integers(0, g - s + 1, (n_a, b)).astype(np.int32)
    # a few dropped points on the zero landing strip (row g, col 0)
    drop = rng.random((n_a, b)) < 0.2
    ay = np.where(drop, g, ay).astype(np.int32)
    ax = np.where(drop, 0, ax).astype(np.int32)

    got = np.asarray(patch_sums_pallas(jnp.asarray(grid), ay, ax, s))
    want = _numpy_patch_sums(grid, ay, ax, s)
    np.testing.assert_array_equal(got, want)


def test_patch_sums_unaligned_offsets():
    # exercise every (row % 8, col % 128) extraction offset class
    rng = np.random.default_rng(1)
    g, s = 160, 9
    grid = rng.integers(0, 101, (g, g)).astype(np.float32) / 100.0
    ys = np.arange(0, 16, dtype=np.int32)
    xs = (np.arange(16, dtype=np.int32) * 9) % (g - s)
    ay = np.stack([ys, ys + 3])
    ax = np.stack([xs, xs])
    got = np.asarray(patch_sums_pallas(jnp.asarray(grid), ay, ax, s))
    big = np.zeros((g + s + 8, g + s + 128), np.float32)
    big[:g, :g] = np.round(grid * 100.0)
    want = np.zeros((2, s, s), np.float32)
    for a in range(2):
        for p in range(ay.shape[1]):
            want[a] += big[ay[a, p] : ay[a, p] + s, ax[a, p] : ax[a, p] + s]
    np.testing.assert_array_equal(got, want)


def test_patch_sums_stride2_matches_full_readout():
    """The parity-split stride-2 kernel must equal the full kernel's
    patches read at the even sublattice, bit for bit (identical bf16
    addends, identical accumulation order, exact integer sums)."""
    from tpuslam.ops.pallas_correlative import patch_sums_stride2

    rng = np.random.default_rng(2)
    g, s2, n_a, b = 97, 11, 4, 50
    span = 2 * (s2 - 1) + 1  # full-res rows a stride-2 patch touches
    grid = rng.integers(0, 101, (g, g)).astype(np.float32) / 100.0
    ay = rng.integers(0, g - span + 1, (n_a, b)).astype(np.int32)
    ax = rng.integers(0, g - span + 1, (n_a, b)).astype(np.int32)
    ok = rng.random((n_a, b)) >= 0.2

    got = np.asarray(
        patch_sums_stride2(jnp.asarray(grid), ay, ax, jnp.asarray(ok), s2)
    )
    ay_f = np.where(ok, ay, g).astype(np.int32)
    ax_f = np.where(ok, ax, 0).astype(np.int32)
    want = _numpy_patch_sums(grid, ay_f, ax_f, span)[:, ::2, ::2]
    np.testing.assert_array_equal(got, want)


def test_match_scan_stride2_pallas_vs_fft():
    """Loop-scale spec (size >= 40 takes the stride-2 cond path in
    _correlate): pallas must stay bit-identical to the fft path."""
    spec = CorrelativeSpec(
        resolution=0.1, search_dim=8.0, smear_deviation=0.3,
        range_threshold=10.0,
    )
    # static eligibility must hold for this spec (half=41 -> size 83)
    half = int(round(0.5 * (spec.search_side - 1) * spec.resolution
                     / spec.resolution)) + 1
    assert 2 * half + 1 >= 40
    true = np.array([0.0, 0.0, 0.0])
    start = np.array([0.6, -0.4, 0.15])
    lpts, lv = _scan_pts(true, nb=180)
    bpts = se2.transform_points(jnp.asarray(true, jnp.float32), lpts)
    res_p, res_fft = (
        match_scan(
            dataclasses.replace(spec, response_method=m),
            jnp.asarray(start, jnp.float32),
            lpts, lv, bpts[None], lv[None],
            penalize=False, refine=False,
        )
        for m in ("pallas", "fft")
    )
    np.testing.assert_array_equal(np.asarray(res_p.pose),
                                  np.asarray(res_fft.pose))
    np.testing.assert_array_equal(np.asarray(res_p.response),
                                  np.asarray(res_fft.response))
    # covariance reduces the same resp values but in differently-fused
    # programs (the stride-2 lax.cond changes XLA's reduction layout) —
    # f32 reassociation noise only
    np.testing.assert_allclose(np.asarray(res_p.covariance),
                               np.asarray(res_fft.covariance),
                               rtol=1e-5, atol=1e-8)

    # the RESPONSE SURFACE itself must be bit-identical (deterministic
    # check, no fusion in the way): compare _correlate outputs directly
    import jax

    from tpuslam.match.correlative import (_correlate,
                                           build_correlation_grid,
                                           find_valid_points)

    center = jnp.asarray(start, jnp.float32)
    vp = jax.vmap(lambda p, v: find_valid_points(p, v, center[:2]))(
        bpts[None], lv[None]
    )
    grid = build_correlation_grid(spec, center[:2], bpts[None], vp)
    cxy = spec.coarse_xy()
    r_p = _correlate(dataclasses.replace(spec, response_method="pallas"),
                     grid, center[:2], center, lpts, lv, cxy,
                     spec.coarse_angles(), False)[0]
    r_f = _correlate(dataclasses.replace(spec, response_method="fft"),
                     grid, center[:2], center, lpts, lv, cxy,
                     spec.coarse_angles(), False)[0]
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_f))


def _scan_pts(pose, nb=360):
    r, amin, ainc = simulate_scan(SEGS, pose, num_beams=nb, max_range=30.0)
    sc = make_scan(r, angle_min=amin, angle_increment=ainc,
                   range_min=0.1, range_max=6.0, num_beams=nb)
    return scan_to_points(sc)


def test_match_scan_pallas_vs_fft_and_patch():
    true = np.array([0.0, 0.0, 0.0])
    start = np.array([0.1, -0.08, 0.1])
    lpts, lv = _scan_pts(true)
    bpts = se2.transform_points(jnp.asarray(true, jnp.float32), lpts)
    assert vmem_fits(SPEC.grid_size, 2 * (SPEC.search_side // 2 + 1) + 1)
    res_p, res_fft, res_patch = (
        match_scan(
            dataclasses.replace(SPEC, response_method=m),
            jnp.asarray(start, jnp.float32),
            lpts, lv, bpts[None], lv[None],
        )
        for m in ("pallas", "fft", "patch")
    )
    # pallas sums exact x100 integers like fft/conv: bit-identical to fft
    np.testing.assert_array_equal(np.asarray(res_p.pose),
                                  np.asarray(res_fft.pose))
    np.testing.assert_array_equal(np.asarray(res_p.response),
                                  np.asarray(res_fft.response))
    np.testing.assert_array_equal(np.asarray(res_p.covariance),
                                  np.asarray(res_fft.covariance))
    # patch sums inexact f32 probabilities: agree to one ulp
    np.testing.assert_allclose(np.asarray(res_p.pose),
                               np.asarray(res_patch.pose),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_p.response),
                               np.asarray(res_patch.response),
                               rtol=1e-6, atol=0)
