"""Mosaic-compiled Pallas kernels vs XLA reference paths, production sizes.

Every kernel the library can select on TPU is executed here through the
real Mosaic compiler at every production operating size and bit-checked
against an independently-computed XLA path:

- ``patch_sums_pallas`` / ``patch_sums_stride2`` via ``_correlate``
  (response_method='pallas' vs 'fft'/'patch'/'conv' — all documented
  exact, Mapper.cpp:819-856 semantics) at the sequential 0.01 m and
  0.05 m grids, the default 8 m and outdoor 15 m loop grids, 512 and
  1081 beams, and the 81-angle response-expansion sweep,
- ``correspondences_pallas`` (PL-ICP) vs the XLA 4-pass chain at
  512/1081 beams on an exact lattice,
- ``match_level_pallas`` (hector GN) vs the XLA MXU path.

These assertions would have caught both Mosaic-vs-interpreter
divergences found by hand in round 2 (TODO.md): a mis-rotating roll
shifts every extracted patch, and any compile crash fails the test
outright.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.core import se2
from tpuslam.match.correlative import (CorrelativeSpec, _correlate,
                                       build_correlation_grid,
                                       find_valid_points)

# production operating points (core/config.py defaults + outdoor preset)
SPECS = {
    "seq_default": CorrelativeSpec(
        resolution=0.01, search_dim=0.3, smear_deviation=0.03,
        range_threshold=12.0),
    "seq_outdoor": CorrelativeSpec(
        resolution=0.05, search_dim=0.3, smear_deviation=0.03,
        range_threshold=12.0),
    "loop_default": CorrelativeSpec(
        resolution=0.05, search_dim=8.0, smear_deviation=0.03,
        range_threshold=12.0),
    "loop_outdoor": CorrelativeSpec(
        resolution=0.1, search_dim=15.0, smear_deviation=0.3,
        range_threshold=50.0),
}


def _fixture(nb, chain=8, seed=0, rmax=10.0):
    rng = np.random.default_rng(seed)
    angles = np.linspace(-2.35, 2.35, nb)
    r = rmax * (0.7 + 0.2 * np.sin(3 * angles))
    local = np.stack([r * np.cos(angles), r * np.sin(angles)], -1)
    base = local[None] + rng.normal(0, 0.05, (chain, nb, 2))
    valid = jnp.asarray(rng.random(nb) > 0.05)
    bvalid = jnp.asarray(rng.random((chain, nb)) > 0.05)
    return (jnp.asarray(local, jnp.float32), valid,
            jnp.asarray(base, jnp.float32), bvalid)


def _responses(spec, nb, angles=None, rmax=10.0):
    """Coarse response surface for each backend that is eligible on TPU."""
    local, valid, base, bvalid = _fixture(nb, rmax=rmax)
    center = jnp.zeros(3, jnp.float32)
    vp = jax.vmap(lambda p, v: find_valid_points(p, v, center[:2]))(
        base, bvalid)
    grid = build_correlation_grid(spec, center[:2], base, vp)
    cxy = spec.coarse_xy()
    angs = spec.coarse_angles() if angles is None else angles
    half = int(round(0.5 * (spec.search_side - 1)
                     * spec.resolution / spec.resolution)) + 1
    size = 2 * half + 1
    patch_bytes = len(angs) * nb * size * size * 4
    # conv uses the whole correlation grid as the conv kernel — gate it by
    # GRID SIZE, not a FLOPs formula: a G>~700 kernel conv lowers
    # pathologically on the tunneled chip regardless of nominal FLOPs (a
    # single 2431^2-kernel dispatch once wedged the shared device queue
    # for HOURS, and killing the client does not cancel server-side work;
    # TODO.md Engineering).  The raw-FLOPs guard used here before did NOT
    # exclude the seq_default spec (2.7e11 < 1e12) — exactly the program
    # class that caused the wedge.
    out = {}
    for method in ("pallas", "fft", "patch", "conv"):
        sp = dataclasses.replace(spec, response_method=method)
        if method == "conv" and spec.grid_size > 700:
            continue
        if method == "patch" and patch_bytes > 192 * 1024 * 1024:
            continue  # same oversize rule as 'auto'
        f = jax.jit(lambda g, lp, v, sp=sp: _correlate(
            sp, g, center[:2], center, lp, v, cxy, angs, False)[0])
        out[method] = np.asarray(f(grid, local, valid))
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
@pytest.mark.parametrize("nb", [512, 1081])
def test_response_surface_bit_identical(name, nb):
    spec = SPECS[name]
    rmax = 0.8 * spec.range_threshold
    resp = _responses(spec, nb, rmax=rmax)
    assert "pallas" in resp and len(resp) >= 2
    ref_name = "fft" if "fft" in resp else "patch"
    for m, r in resp.items():
        np.testing.assert_array_equal(
            r, resp[ref_name],
            err_msg=f"{name}/{nb}: {m} != {ref_name}")


def test_expansion_sweep_81_angles():
    """The +60 deg response-expansion retry widens the sweep to ~81
    angles (Mapper.cpp:242-272) — the largest SMEM index load the
    pallas kernel ever sees; must stay bit-identical there too."""
    spec = SPECS["loop_outdoor"]
    angs = spec.coarse_angles(extra=np.deg2rad(60.0))
    assert len(angs) >= 70
    resp = _responses(spec, 1081, angles=angs, rmax=0.8 * 50.0)
    np.testing.assert_array_equal(resp["pallas"], resp["fft"])


def test_stride2_kernel_vs_full_readout_loop_size():
    """Direct kernel-level check at the 15 m loop operating size: the
    parity-split stride-2 kernel must equal the full kernel's patches
    read at the even sublattice, bit for bit."""
    from tpuslam.ops.pallas_correlative import (patch_sums_pallas,
                                                patch_sums_stride2)

    spec = SPECS["loop_outdoor"]
    g = spec.grid_size
    s2 = (spec.search_side // 2) + 1
    span = 2 * (s2 - 1) + 1
    rng = np.random.default_rng(3)
    grid = jnp.asarray(
        rng.integers(0, 101, (g, g)).astype(np.float32) / 100.0)
    n_a, b = 21, 1081
    ay = jnp.asarray(rng.integers(0, g - span, (n_a, b)), jnp.int32)
    ax = jnp.asarray(rng.integers(0, g - span, (n_a, b)), jnp.int32)
    ok = jnp.asarray(rng.random((n_a, b)) > 0.1)

    got = np.asarray(patch_sums_stride2(grid, ay, ax, ok, s2))
    ay_f = jnp.where(ok, ay, g)
    ax_f = jnp.where(ok, ax, 0)
    want = np.asarray(patch_sums_pallas(grid, ay_f, ax_f, span))
    np.testing.assert_array_equal(got, want[:, ::2, ::2])


@pytest.mark.parametrize("nb", [512, 1081])
def test_plicp_correspondences_bit_exact(nb):
    from tests.test_pallas_plicp import _fixture as plicp_fixture
    from tests.test_pallas_plicp import _xla_reference
    from tpuslam.ops.pallas_plicp import correspondences_pallas

    cur, sv, ref, rv = plicp_fixture(b=nb, nref=nb, exact=True)
    for remove_doubles in (True, False):
        got = correspondences_pallas(
            cur, sv, ref, rv, jnp.float32(1.0), remove_doubles)
        want = _xla_reference(cur, sv, ref, rv, 1.0, remove_doubles)
        ok_g, ok_w = np.asarray(got[3]), np.asarray(want[3])
        np.testing.assert_array_equal(ok_g, ok_w)
        for gv, wv in zip(got[:3], want[:3]):
            np.testing.assert_array_equal(
                np.asarray(gv)[ok_g], np.asarray(wv)[ok_w])


def test_hector_gn_kernel_close_to_xla():
    """The hector Pallas GN kernel is opt-in (XLA wins the full pyramid)
    but must keep compiling and landing on the same optimum on
    hardware.  bf16 MXU reductions reassociate differently between the
    two programs, so this one is tolerance-based, not bit-exact."""
    from tests.test_pallas_hector import setup
    from tpuslam.match.hector import match_level
    from tpuslam.ops.pallas_hector import match_level_pallas

    cfg, spec, grid, pts_map, valid = setup(num_beams=512, map_size=512)
    pose0 = spec.world_pose_to_map(
        jnp.asarray([0.04, -0.03, 0.02], jnp.float32))
    pose_x, _, score_x = match_level(
        grid, pts_map, valid, pose0, num_iters=3, window=512,
        compute_dtype=jnp.bfloat16)
    poses, _, scores = match_level_pallas(
        grid, pts_map[None], valid[None], pose0[None],
        window=512, num_iters=3)
    np.testing.assert_allclose(
        np.asarray(poses[0]), np.asarray(pose_x), atol=0.08)


def test_roll_contract():
    """The invariant both correlative kernels rely on: dynamic
    ``pltpu.roll`` with POSITIVE-equivalent shifts matches ``jnp.roll``
    on non-power-of-two f32 tiles (negative shifts are known-broken on
    v5e Mosaic and are never emitted)."""
    from tpuslam.ops.pallas_correlative import _roll_selfcheck

    assert _roll_selfcheck()
