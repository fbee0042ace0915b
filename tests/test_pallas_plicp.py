"""Fused Pallas PL-ICP correspondence kernel vs the XLA chain."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.config import PlicpConfig
from tpuslam.match.plicp import BIG, _correspondences, plicp
from tpuslam.ops.pallas_plicp import correspondences_pallas


def _xla_reference(cur, sv, ref, rv, max_d2, remove_doubles):
    oh1, oh2, d1, ok = _correspondences(cur, sv, ref, rv)
    ok = ok & (d1 < max_d2)
    if remove_doubles:
        dmat = jnp.where((oh1 > 0) & ok[:, None], d1[:, None], BIG)
        best_per_ref = jnp.min(dmat, axis=0)
        my_best = jnp.sum(oh1 * best_per_ref[None, :], axis=-1)
        ok = ok & (d1 <= my_best + 1e-12)
    q1 = jnp.dot(oh1, ref, precision=jax.lax.Precision.HIGHEST)
    q2 = jnp.dot(oh2, ref, precision=jax.lax.Precision.HIGHEST)
    return q1, q2, d1, ok


def _fixture(seed=0, b=96, nref=100, exact=False):
    rng = np.random.default_rng(seed)
    ang = np.linspace(-2.0, 2.0, nref)
    r = 4.0 + np.sin(3 * ang)
    ref = np.stack([r * np.cos(ang), r * np.sin(ang)], -1)
    cur = ref[rng.integers(0, nref, b)] + rng.normal(0, 0.05, (b, 2))
    if exact:
        # snap to 1/64 multiples: squares and sums are exact in f32, so
        # FMA-vs-not cannot change d2 and the kernel must match bit-exactly
        ref = np.round(ref * 64.0) / 64.0
        cur = np.round(cur * 64.0) / 64.0
    sv = rng.random(b) > 0.1
    rv = rng.random(nref) > 0.1
    return (jnp.asarray(cur, jnp.float32), jnp.asarray(sv),
            jnp.asarray(ref, jnp.float32), jnp.asarray(rv))


def test_kernel_matches_xla_chain_bitexact_on_lattice():
    cur, sv, ref, rv = _fixture(exact=True)
    for remove_doubles in (True, False):
        for max_d2 in (1.0, 0.01):
            got = correspondences_pallas(
                cur, sv, ref, rv, jnp.float32(max_d2), remove_doubles
            )
            want = _xla_reference(cur, sv, ref, rv, max_d2, remove_doubles)
            ok_g, ok_w = np.asarray(got[3]), np.asarray(want[3])
            np.testing.assert_array_equal(ok_g, ok_w)
            for g, w in zip(got[:3], want[:3]):
                # compare only where used (ok rows); masked rows may differ
                # on the all-invalid degenerate q2
                np.testing.assert_array_equal(
                    np.asarray(g)[ok_g], np.asarray(w)[ok_w]
                )


def test_kernel_matches_xla_chain_noisy_within_ulp():
    """On arbitrary f32 coordinates d1 may differ by one FMA ulp (module
    docstring contract); the selected points must still agree wherever the
    correspondence is not an exact-tie case."""
    cur, sv, ref, rv = _fixture()
    got = correspondences_pallas(cur, sv, ref, rv, jnp.float32(1.0), True)
    want = _xla_reference(cur, sv, ref, rv, 1.0, True)
    ok_g, ok_w = np.asarray(got[3]), np.asarray(want[3])
    np.testing.assert_array_equal(ok_g, ok_w)
    np.testing.assert_array_equal(np.asarray(got[0])[ok_g],
                                  np.asarray(want[0])[ok_w])
    np.testing.assert_array_equal(np.asarray(got[1])[ok_g],
                                  np.asarray(want[1])[ok_w])
    np.testing.assert_allclose(np.asarray(got[2])[ok_g],
                               np.asarray(want[2])[ok_w], rtol=1e-6)


def test_kernel_all_invalid_and_edges():
    cur, sv, ref, rv = _fixture(seed=3)
    q1, q2, d1, ok = correspondences_pallas(
        cur, jnp.zeros_like(sv), ref, rv, jnp.float32(1.0), True
    )
    assert not bool(jnp.any(ok))
    assert np.isfinite(np.asarray(q1)).all()


def test_plicp_pallas_path_matches_xla():
    cur, sv, ref, rv = _fixture(seed=1)
    base = PlicpConfig(num_beams=96, max_iterations=8)
    guess = jnp.asarray([0.03, -0.02, 0.01], jnp.float32)
    res_x, res_p = (
        plicp(dataclasses.replace(base, correspondence_method=m),
              cur, sv, ref, rv, guess)
        for m in ("xla", "pallas")
    )
    np.testing.assert_allclose(np.asarray(res_p.pose),
                               np.asarray(res_x.pose), atol=1e-6)
    assert bool(res_p.valid) == bool(res_x.valid)
    np.testing.assert_allclose(float(res_p.mean_error),
                               float(res_x.mean_error), atol=1e-6)
    assert int(res_p.num_inliers) == int(res_x.num_inliers)


def test_plicp_batch_vmap_routes_packed_kernel():
    """plicp_batch (vmap) must route through the packed kernel's custom
    batching rule and agree with per-pair calls."""
    from tpuslam.match.plicp import plicp_batch

    pairs = [_fixture(seed=s) for s in range(5)]
    cur = jnp.stack([p[0] for p in pairs])
    sv = jnp.stack([p[1] for p in pairs])
    ref = jnp.stack([p[2] for p in pairs])
    rv = jnp.stack([p[3] for p in pairs])
    cfg = PlicpConfig(num_beams=96, max_iterations=6,
                      correspondence_method="pallas")
    guesses = jnp.zeros((5, 3))
    batched = plicp_batch(cfg, cur, sv, ref, rv, guesses)
    for i in range(5):
        single = plicp(cfg, cur[i], sv[i], ref[i], rv[i], guesses[i])
        np.testing.assert_allclose(np.asarray(batched.pose[i]),
                                   np.asarray(single.pose), atol=1e-6)


def test_icp_nearest_mode_matches_xla():
    """Point-to-point ICP via the nearest-only kernel mode must track the
    XLA chain (ulp-level FMA tolerance on the pose)."""
    from tpuslam.core.config import IcpConfig
    from tpuslam.match.icp import icp, icp_batch

    pairs = [_fixture(seed=s, b=128, nref=128) for s in range(3)]
    cur = jnp.stack([p[0] for p in pairs])
    sv = jnp.stack([p[1] for p in pairs])
    ref = jnp.stack([p[2] for p in pairs])
    rv = jnp.stack([p[3] for p in pairs])
    guesses = jnp.zeros((3, 3))
    res_x, res_p = (
        icp_batch(IcpConfig(num_beams=128, correspondence_method=m),
                  cur, sv, ref, rv, guesses)
        for m in ("xla", "pallas")
    )
    np.testing.assert_allclose(np.asarray(res_p.pose),
                               np.asarray(res_x.pose), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_p.converged),
                                  np.asarray(res_x.converged))
    # single-pair path too
    one = icp(IcpConfig(num_beams=128, correspondence_method="pallas"),
              cur[0], sv[0], ref[0], rv[0], guesses[0])
    np.testing.assert_allclose(np.asarray(one.pose),
                               np.asarray(res_p.pose[0]), atol=1e-6)
