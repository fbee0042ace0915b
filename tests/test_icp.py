"""ICP and PL-ICP matchers: recover known rigid transforms."""

import numpy as np
import jax
import jax.numpy as jnp

from tpuslam.core import se2
from tpuslam.core.config import IcpConfig, PlicpConfig
from tpuslam.core.scan import make_scan, scan_to_points
from tpuslam.io.simulate import rect_room, simulate_scan, world_with_boxes
from tpuslam.match.icp import icp, icp_batch, rigid_fit_2d
from tpuslam.match.plicp import plicp

SEGS = world_with_boxes()
ICP_CFG = IcpConfig(num_beams=360, max_iterations=20)
PL_CFG = PlicpConfig(num_beams=360)


def scan_points(pose, num_beams=360, noise=0.0, seed=0):
    r, amin, ainc = simulate_scan(
        SEGS, pose, num_beams=num_beams, max_range=30.0, noise_std=noise,
        rng=np.random.default_rng(seed),
    )
    sc = make_scan(r, angle_min=amin, angle_increment=ainc,
                   range_min=0.1, range_max=30.0, num_beams=num_beams)
    return scan_to_points(sc)


def test_rigid_fit_exact():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-3, 3, (50, 2)).astype(np.float32))
    true = jnp.array([0.4, -0.2, 0.3])
    dst = se2.transform_points(true, src)
    got = rigid_fit_2d(src, dst, jnp.ones(50))
    assert np.allclose(np.asarray(got), np.asarray(true), atol=1e-5)


def test_icp_recovers_transform():
    # scans from two nearby poses; icp(src=scan@a, dst=scan@b) should return
    # the pose of frame a's points in frame b: b⁻¹ ∘ a
    pa = np.array([0.0, 0.0, 0.0])
    pb = np.array([0.08, -0.05, 0.06])
    pts_a, va = scan_points(pa)
    pts_b, vb = scan_points(pb)
    res = icp(ICP_CFG, pts_a, va, pts_b, vb)
    want = np.asarray(se2.relative(jnp.asarray(pb, jnp.float32),
                                   jnp.asarray(pa, jnp.float32)))
    got = np.asarray(res.pose)
    assert bool(res.converged)
    assert np.allclose(got, want, atol=0.02), (got, want)


def test_plicp_recovers_transform_tighter():
    pa = np.array([0.0, 0.0, 0.0])
    pb = np.array([0.1, -0.06, 0.08])
    pts_a, va = scan_points(pa, noise=0.005, seed=1)
    pts_b, vb = scan_points(pb, noise=0.005, seed=2)
    # match current (pose pb) against reference (pose pa):
    res = plicp(PL_CFG, pts_b, vb, pts_a, va)
    want = np.asarray(se2.relative(jnp.asarray(pa, jnp.float32),
                                   jnp.asarray(pb, jnp.float32)))
    got = np.asarray(res.pose)
    assert bool(res.valid)
    assert np.allclose(got, want, atol=0.02), (got, want)


def test_plicp_invalid_when_out_of_trust_region():
    pa = np.zeros(3)
    pts_a, va = scan_points(pa)
    # absurd initial guess: CSM's max_linear/angular_correction bound the
    # search AROUND the guess — the result must stay inside that region
    # (it cannot jump back to the true answer), and the residual betrays it
    guess = jnp.array([5.0, 5.0, 2.0])
    res = plicp(PL_CFG, pts_a, va, pts_a, va, guess)
    d = np.asarray(res.pose) - np.asarray(guess)
    assert abs(d[0]) <= PL_CFG.max_linear_correction + 1e-5
    assert abs(d[1]) <= PL_CFG.max_linear_correction + 1e-5
    assert float(res.mean_error) > 0.05  # detectably bad match


def test_plicp_identity_on_identical_scans():
    pts, v = scan_points(np.zeros(3))
    res = plicp(PL_CFG, pts, v, pts, v)
    assert bool(res.valid)
    assert np.allclose(np.asarray(res.pose), 0.0, atol=1e-3)


def test_icp_batch_vmap():
    pa = np.zeros(3)
    pts_a, va = scan_points(pa)
    n = 4
    rng = np.random.default_rng(7)
    trues, srcs = [], []
    for i in range(n):
        pb = rng.uniform(-0.08, 0.08, 3)
        pts_b, vb = scan_points(pb, seed=i + 10)
        srcs.append(pts_b)
        trues.append(np.asarray(se2.relative(jnp.zeros(3), jnp.asarray(pb, jnp.float32))))
    src = jnp.stack(srcs)
    res = icp_batch(
        ICP_CFG,
        src,
        jnp.tile(va, (n, 1)),
        jnp.tile(pts_a, (n, 1, 1)),
        jnp.tile(va, (n, 1)),
        jnp.zeros((n, 3)),
    )
    got = np.asarray(res.pose)
    assert np.allclose(got, np.stack(trues), atol=0.03), (got, np.stack(trues))


def test_plicp_alpha_test_knob():
    import dataclasses as dc

    pa = np.zeros(3)
    pb = np.array([0.06, -0.04, 0.05])
    pts_a, va = scan_points(pa, noise=0.003, seed=3)
    pts_b, vb = scan_points(pb, noise=0.003, seed=4)
    cfg = dc.replace(PL_CFG, do_alpha_test=1, do_alpha_test_thresholdDeg=20.0)
    res = plicp(cfg, pts_b, vb, pts_a, va)
    want = np.asarray(se2.relative(jnp.zeros(3), jnp.asarray(pb, jnp.float32)))
    assert bool(res.valid)
    assert np.allclose(np.asarray(res.pose), want, atol=0.03), res.pose
    # the test must actually reject some correspondences vs the default
    res0 = plicp(PL_CFG, pts_b, vb, pts_a, va)
    assert int(res.num_inliers) <= int(res0.num_inliers)


def test_plicp_point_to_point_fallback():
    """use_point_to_line_distance=0 routes through the rigid-fit branch."""
    import dataclasses as dc

    pa = np.zeros(3)
    pb = np.array([0.05, -0.03, 0.04])
    pts_a, va = scan_points(pa)
    pts_b, vb = scan_points(pb)
    cfg = dc.replace(PL_CFG, use_point_to_line_distance=0)
    res = plicp(cfg, pts_b, vb, pts_a, va)
    want = np.asarray(se2.relative(jnp.zeros(3), jnp.asarray(pb, jnp.float32)))
    assert bool(res.valid)
    assert np.allclose(np.asarray(res.pose), want, atol=0.03), res.pose


def test_plicp_restart_knob():
    """restart=1 re-runs from a displaced guess when the converged error is
    high and keeps the better solution; with a good match it is a no-op."""
    import dataclasses as dc

    pa = np.zeros(3)
    pb = np.array([0.06, -0.04, 0.05])
    pts_a, va = scan_points(pa, noise=0.003, seed=5)
    pts_b, vb = scan_points(pb, noise=0.003, seed=6)
    cfg = dc.replace(PL_CFG, restart=1, restart_threshold_mean_error=0.01,
                     restart_dt=0.05, restart_dtheta=0.05)
    res = plicp(cfg, pts_b, vb, pts_a, va)
    res0 = plicp(PL_CFG, pts_b, vb, pts_a, va)
    want = np.asarray(se2.relative(jnp.zeros(3), jnp.asarray(pb, jnp.float32)))
    assert bool(res.valid)
    assert np.allclose(np.asarray(res.pose), want, atol=0.03)
    # restart must never be WORSE than the single-pass result
    assert float(res.mean_error) <= float(res0.mean_error) + 1e-6


def test_plicp_line_uses_closer_neighbor():
    """The second line point must be the CLOSER scan-neighbor of j1 (CSM
    find_correspondences' best second point), with edge fallback."""
    import jax.numpy as jnp

    from tpuslam.match.plicp import _correspondences

    ref = jnp.asarray([[0.0, 0], [1, 0], [2, 0], [3, 0], [4, 0]])
    rv = jnp.ones(5, bool)
    for x, want in ((2.3, 3), (1.8, 1), (0.2, 1), (3.9, 3)):
        cur = jnp.asarray([[x, 0.1]])
        oh1, oh2, _, ok = _correspondences(cur, jnp.ones(1, bool), ref, rv)
        assert int(jnp.argmax(oh2[0])) == want, (x, jnp.argmax(oh2[0]))
        assert bool(ok[0])


def test_plicp_covariance_matches_finite_difference():
    """do_compute_covariance: cov = sigma^2 * inv(J^T W J) of the final
    point-to-line normal system (CSM compute_covariance analog,
    plicp_odometry.cc:373-387).  Validated against a finite-difference
    Hessian of the fixed-correspondence energy at the converged pose."""
    import dataclasses

    cfg = dataclasses.replace(PL_CFG, do_compute_covariance=1, sigma=0.01)
    pa = np.array([0.0, 0.0, 0.0])
    pb = np.array([0.1, -0.06, 0.08])
    pts_a, va = scan_points(pa, noise=0.0005, seed=3)
    pts_b, vb = scan_points(pb, noise=0.0005, seed=4)
    res = plicp(cfg, pts_b, vb, pts_a, va)
    assert bool(res.valid)
    cov = np.asarray(res.covariance, np.float64)
    assert cov.shape == (3, 3)
    assert np.allclose(cov, cov.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(cov) > 0)

    # reconstruct the frozen correspondence set at the converged pose and
    # finite-difference the energy E(p) = 0.5 sum w r(p)^2
    pose = np.asarray(res.pose, np.float64)
    src = np.asarray(pts_b, np.float64)
    sv = np.asarray(vb)
    ref = np.asarray(pts_a, np.float64)
    rv = np.asarray(va)

    def correspond(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        cur = src @ np.array([[c, s], [-s, c]]) + p[:2]
        d2 = ((cur[:, None] - ref[None]) ** 2).sum(-1)
        d2 = np.where(rv[None, :] & sv[:, None], d2, 1e9)
        j1 = np.argmin(d2, axis=1)
        d1 = d2[np.arange(len(src)), j1]
        n_ref = len(ref)
        d_r = np.where(j1 == n_ref - 1, 1e9,
                       d2[np.arange(len(src)), (j1 + 1) % n_ref])
        d_l = np.where(j1 == 0, 1e9, d2[np.arange(len(src)), j1 - 1])
        j2 = np.where(d_r < d_l, j1 + 1, j1 - 1)
        ok = (d1 < 1e9) & (np.minimum(d_r, d_l) < 1e9) & (
            d1 < cfg.max_correspondence_dist**2
        )
        # maxPerc trim on the point-to-LINE distance (the rule
        # _covariance_at applies)
        j2c = np.clip(j2, 0, n_ref - 1)
        t = ref[j2c] - ref[j1]
        nn = np.stack([-t[:, 1], t[:, 0]], -1)
        nn /= np.maximum(np.linalg.norm(nn, axis=-1, keepdims=True), 1e-9)
        dist = np.abs(((cur - ref[j1]) * nn).sum(-1))
        sd = np.sort(np.where(ok, dist, 1e9))
        k = min(int(ok.sum() * cfg.outliers_maxPerc), len(src) - 1)
        ok = ok & (dist <= max(sd[k], 1e-9))
        return j1, j2c, ok & sv

    j1, j2, w = correspond(pose)
    q1, q2 = ref[j1], ref[j2]
    t = q2 - q1
    nrm = np.stack([-t[:, 1], t[:, 0]], -1)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)

    def residuals(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        cur = src @ np.array([[c, s], [-s, c]]) + p[:2]
        return ((cur - q1) * nrm).sum(-1)

    # finite-difference Jacobian of the frozen-correspondence residuals →
    # the Gauss-Newton Hessian J^T W J (the estimator the covariance
    # inverts; the full energy Hessian additionally carries the
    # residual-curvature term GN legitimately drops)
    eps = 1e-6
    fd_j = np.zeros((len(src), 3))
    for i in range(3):
        pp = pose.copy(); pp[i] += eps
        pm = pose.copy(); pm[i] -= eps
        fd_j[:, i] = (residuals(pp) - residuals(pm)) / (2 * eps)
    fd_h = fd_j.T @ (w[:, None] * fd_j)
    want_cov = cfg.sigma**2 * np.linalg.inv(fd_h)
    assert np.allclose(cov, want_cov, rtol=0.1, atol=2e-9), (
        cov, want_cov,
    )


def test_scan_orientations_wall_and_cluster_break():
    """The cluster-bounded neighbourhood normal fit (CSM
    ld_compute_orientation semantics): a straight wall yields the wall's
    normal angle (mod pi) at every interior point, and a range jump
    splits the fit so normals never blend across the discontinuity."""
    from tpuslam.match.plicp import scan_orientations

    # two parallel walls at x=2 (beams 0-39) and x=6 (beams 40-79),
    # sampled by bearing: ranges jump at the seam
    bear = np.linspace(-0.4, 0.4, 80)
    xwall = np.where(np.arange(80) < 40, 2.0, 6.0)
    r = xwall / np.cos(bear)
    pts = jnp.asarray(
        np.stack([r * np.cos(bear), r * np.sin(bear)], -1), jnp.float32
    )
    valid = jnp.ones(80, bool)
    alpha, avalid = scan_orientations(pts, valid, 10, 0.25)
    alpha = np.asarray(alpha)
    avalid = np.asarray(avalid)
    assert avalid.all()
    # wall normal is the x axis: alpha = 0 mod pi
    err = np.abs(np.sin(alpha))  # distance of alpha from {0, pi}
    assert err.max() < 0.02, err.max()

    # the seam is a cluster break: the fit at beam 39 must use only
    # wall-1 points — with a huge clustering threshold the two walls
    # merge into one cluster and the seam normals WOULD blend
    alpha2, _ = scan_orientations(pts, valid, 10, 1e9)
    err2 = np.abs(np.sin(np.asarray(alpha2)))
    assert err2.max() > 0.2  # blended fit near the seam deviates
    assert err.max() < 0.02  # cluster-bounded fit does not


def test_plicp_ml_weights_knob():
    import dataclasses as dc

    pa = np.zeros(3)
    pb = np.array([0.06, -0.04, 0.05])
    pts_a, va = scan_points(pa, noise=0.003, seed=3)
    pts_b, vb = scan_points(pb, noise=0.003, seed=4)
    cfg = dc.replace(PL_CFG, use_ml_weights=1)
    res = plicp(cfg, pts_b, vb, pts_a, va)
    want = np.asarray(se2.relative(jnp.zeros(3), jnp.asarray(pb, jnp.float32)))
    assert bool(res.valid)
    assert np.allclose(np.asarray(res.pose), want, atol=0.03), res.pose


def test_plicp_sigma_weights_do_not_move_the_pose():
    """Uniform 1/sigma^2 scaling of the normal system cannot change the
    GN argmin — the knob only calibrates covariance scale."""
    import dataclasses as dc

    pa = np.zeros(3)
    pb = np.array([0.05, -0.03, 0.04])
    pts_a, va = scan_points(pa, noise=0.002, seed=5)
    pts_b, vb = scan_points(pb, noise=0.002, seed=6)
    res0 = plicp(PL_CFG, pts_b, vb, pts_a, va)
    res1 = plicp(dc.replace(PL_CFG, use_sigma_weights=1),
                 pts_b, vb, pts_a, va)
    assert np.allclose(np.asarray(res0.pose), np.asarray(res1.pose),
                       atol=1e-5)


def test_plicp_stats_describe_returned_pose():
    """mean_error/num_inliers come from the loop's CONFIRM pass at the
    RETURNED pose (CSM report-at-converged-pose semantics) — re-matching
    from the returned pose must reproduce them (regression: the early-exit
    while_loop once reported stats one GN update behind the pose)."""
    pa = np.array([0.0, 0.0, 0.0])
    pb = np.array([0.1, -0.06, 0.08])
    pts_a, va = scan_points(pa, noise=0.002, seed=11)
    pts_b, vb = scan_points(pb, noise=0.002, seed=12)
    res = plicp(PL_CFG, pts_b, vb, pts_a, va)
    assert bool(res.valid)
    res2 = plicp(PL_CFG, pts_b, vb, pts_a, va, init_pose=res.pose)
    # starting at the converged pose: same fixed point, same stats
    assert np.allclose(np.asarray(res2.pose), np.asarray(res.pose), atol=1e-5)
    assert int(res2.num_inliers) == int(res.num_inliers)
    assert np.isclose(
        float(res2.mean_error), float(res.mean_error), rtol=1e-4, atol=1e-7
    )
