"""Point-to-line ICP (PL-ICP), the CSM ``sm_icp`` behavioral equivalent.

The reference shells out to the external CSM C library with ~30 tuning knobs
(reference: lesson3/src/scan_match_plicp.cc + plicp_odometry.cc:58-186 for
the knob set and defaults; the algorithm is Censi's PL-ICP).  Behavior
reproduced here, TPU-first:

- correspondences: for each transformed source point, the closest reference
  point ``j1`` and the closer of its two scan-neighbors ``j2`` form the
  reference line (CSM ``find_correspondences``: same structure, but with a
  windowed search — on TPU the dense [B, B] matmul distance matrix is both
  simpler and faster),
- outlier trimming at the ``outliers_maxPerc`` distance quantile (0.90) plus
  the adaptive cut ``outliers_adaptive_mult x`` the ``adaptive_order``
  quantile (CSM kill_outliers_trim / _double semantics),
- ``outliers_remove_doubles``: when several source points grab the same
  reference point, only the closest keeps it,
- the pose update minimizes the point-to-line error with a 3x3 Gauss-Newton
  normal system (CSM solves the same least-squares problem in closed form
  via gpc; at convergence the optima coincide),
- gating of the step per CSM ``max_angular_correction_deg`` /
  ``max_linear_correction`` (sm_icp clips the initial guess; here the final
  correction is clipped the same way),
- fixed ``max_iterations`` with an ``epsilon_xy``/``epsilon_theta``
  convergence mask (iterations past convergence freeze the estimate, giving
  jit a static trip count with CSM's early-exit semantics).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core import se2
from tpuslam.core.config import PlicpConfig

Array = jax.Array

BIG = 1e9


class PlicpResult(NamedTuple):
    pose: Array  # [..., 3] correction source→reference frame
    valid: Array  # [...] bool — CSM output.valid analog
    mean_error: Array  # [...] mean inlier point-to-line distance
    num_inliers: Array  # [...] int32
    # [..., 3, 3] estimate covariance: sigma^2 * inv(J^T W J) of the final
    # GN normal system (CSM's do_compute_covariance analog — the reference
    # computes cov_x = sigma^2 * inv(d2E/dx2) each cycle and frees it,
    # plicp_odometry.cc:373-387; here it is returned so PL-ICP edges can
    # feed the pose-graph solver).  Identity when do_compute_covariance=0.
    covariance: Array


def _correspondences(
    cur: Array, src_valid: Array, ref: Array, ref_valid: Array
):
    """Closest ref point j1 + neighbor line point j2 per source point.

    TPU shape: no element gathers — the nearest distance is a row min, the
    j1±1 neighbor distances come from lane-rolled copies of the distance
    matrix reduced through the argmin one-hot, and the winners' one-hots are
    rolls of the j1 one-hot.  Returns (oh1, oh2, d1, ok) where oh1/oh2 are
    [B, B'] one-hot selectors of the two line points."""
    n_ref = ref.shape[0]
    # exact f32 distances via broadcasting: the matmul trick runs at TPU's
    # default bf16 precision (flips near-tie correspondences) and requesting
    # HIGHEST costs 6 passes; for K=2 the direct difference is cheap and
    # cancellation-free
    dx = cur[:, None, 0] - ref[None, :, 0]
    dy = cur[:, None, 1] - ref[None, :, 1]
    d2 = dx * dx + dy * dy
    d2 = jnp.where(ref_valid[None, :], d2, BIG)
    d2 = jnp.where(src_valid[:, None], d2, BIG)
    j1 = jnp.argmin(d2, axis=-1)
    d1 = jnp.min(d2, axis=-1)

    cols = jnp.arange(n_ref)[None, :]
    oh1 = (j1[:, None] == cols).astype(cur.dtype)  # [B, B']
    # value at column j1±1 = one-hot reduce of the lane-rolled matrix:
    # roll(d2, -1)[j] = d2[j+1], so reducing through oh1 reads d2[:, j1+1]
    d_r = jnp.sum(oh1 * jnp.roll(d2, -1, axis=-1), axis=-1)  # d2[:, j1+1]
    d_l = jnp.sum(oh1 * jnp.roll(d2, 1, axis=-1), axis=-1)  # d2[:, j1-1]
    d_r = jnp.where(j1 == n_ref - 1, BIG, d_r)  # no right neighbor at end
    d_l = jnp.where(j1 == 0, BIG, d_l)  # no left neighbor at start
    right = d_r < d_l
    # roll(oh1, 1)[j] = oh1[j-1] = 1 iff j == j1+1 — the CLOSER neighbor
    # joins the line (CSM find_correspondences' best second point)
    oh2 = jnp.where(
        right[:, None],
        jnp.roll(oh1, 1, axis=-1),
        jnp.roll(oh1, -1, axis=-1),
    )
    d2nd = jnp.minimum(d_r, d_l)
    ok = (d1 < BIG) & (d2nd < BIG)
    return oh1, oh2, d1, ok


def _kth_smallest(values: Array, mask: Array, k: Array) -> Array:
    """Exact ``sorted(where(mask, values, BIG))[k]`` without a sort.

    Nonnegative f32 values are order-isomorphic to their int32 bit
    patterns, so the (k+1)-th smallest is found by building, bit by bit,
    the largest integer v with ``count(x < v) <= k`` — 31 masked count
    reductions instead of a bitonic sort (the sort was the PL-ICP
    iteration's dominant serial cost on TPU: ~40% of the whole matcher).
    Returns the exact element value (bit-identical to the sort+take)."""
    xm = jnp.where(mask, values, jnp.float32(BIG)).astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(xm, jnp.int32)
    res = jnp.int32(0)
    for b in range(30, -1, -1):
        cand = res | jnp.int32(1 << b)
        cnt = jnp.sum(xi < cand)
        res = jnp.where(cnt <= k, cand, res)
    return jax.lax.bitcast_convert_type(res, jnp.float32)


def _point_line_residual(cur: Array, q1: Array, q2: Array):
    """Signed distance of cur to line(q1, q2) + unit normal."""
    t = q2 - q1
    tn = jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    n = jnp.stack([-t[..., 1], t[..., 0]], axis=-1) / tn
    r = jnp.sum((cur - q1) * n, axis=-1)
    return r, n


def visibility_mask(ref: Array, ref_valid: Array, viewpoint: Array) -> Array:
    """CSM ``visibilityTest`` (csm/icp/icp.c, enabled by the
    ``do_visibility_test`` knob read at plicp_odometry.cc:162-163):
    invalidate reference rays whose polar angle, as seen from the predicted
    NEW viewpoint, is not monotonically increasing vs the previous
    still-valid ray — such surfaces face away from the moved sensor.  Exact
    port of the sequential previous-ray semantics as a lax.scan."""
    theta = jnp.arctan2(ref[:, 1] - viewpoint[1], ref[:, 0] - viewpoint[0])

    def step(carry, inp):
        prev_valid, prev_theta = carry
        v, th = inp
        kill = v & prev_valid & (th < prev_theta)
        new_v = v & ~kill
        return (new_v, th), new_v

    _, out = jax.lax.scan(
        step,
        (jnp.zeros((), bool), jnp.zeros((), theta.dtype)),
        (ref_valid, theta),
    )
    return out


def scan_orientations(
    pts: Array,
    valid: Array,
    neighbourhood: int,
    clustering_threshold: float,
) -> tuple[Array, Array]:
    """Per-point surface-normal angles (CSM ``ld_compute_orientation``).

    CSM segments the scan into clusters wherever consecutive range
    readings jump by more than ``clustering_threshold`` (simple
    clustering; knob read at plicp_odometry.cc:120-121), then estimates
    each point's surface orientation from up to ``neighbourhood``
    same-cluster neighbours on each side (plicp_odometry.cc:124-125) and
    marks the estimate invalid when fewer than 3 points support it.
    tpu-native shape: the cluster ids are a cumsum over break flags and
    the per-point line fit is a masked-moment PCA over a static
    (2k+1)-wide roll-stencil — no gathers, fully vmappable.

    Returns (alpha [B], alpha_valid [B]): ``alpha`` is the NORMAL angle
    of the locally fitted line, defined modulo pi (every consumer — the
    alpha test and the ml incidence weight — is invariant to the normal's
    sign, so no toward-sensor disambiguation is needed)."""
    b = pts.shape[0]
    r = jnp.linalg.norm(pts, axis=-1)
    jump = jnp.abs(r - jnp.roll(r, 1)) > clustering_threshold
    brk = jump | ~valid | ~jnp.roll(valid, 1)
    brk = brk.at[0].set(True)
    cid = jnp.cumsum(brk.astype(jnp.int32))

    idx = jnp.arange(b)
    cnt = jnp.zeros(b, pts.dtype)
    sx = jnp.zeros(b, pts.dtype)
    sy = jnp.zeros(b, pts.dtype)
    sxx = jnp.zeros(b, pts.dtype)
    sxy = jnp.zeros(b, pts.dtype)
    syy = jnp.zeros(b, pts.dtype)
    for o in range(-neighbourhood, neighbourhood + 1):
        m = (
            valid
            & jnp.roll(valid, -o)
            & (cid == jnp.roll(cid, -o))
            & (idx + o >= 0)
            & (idx + o < b)
        ).astype(pts.dtype)
        x = jnp.roll(pts[:, 0], -o)
        y = jnp.roll(pts[:, 1], -o)
        cnt = cnt + m
        sx = sx + m * x
        sy = sy + m * y
        sxx = sxx + m * x * x
        sxy = sxy + m * x * y
        syy = syy + m * y * y
    d = jnp.maximum(cnt, 1.0)
    cxx = sxx / d - (sx / d) ** 2
    cxy = sxy / d - (sx / d) * (sy / d)
    cyy = syy / d - (sy / d) ** 2
    # principal direction of the local point cloud = tangent; normal +90deg
    theta_line = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)
    alpha = theta_line + 0.5 * math.pi
    return alpha, valid & (cnt >= 3)


def plicp(
    cfg: PlicpConfig,
    src: Array,
    src_valid: Array,
    ref: Array,
    ref_valid: Array,
    init_pose: Array | None = None,
) -> PlicpResult:
    """Match src [B,2] onto ref [B',2]; returns the correcting pose."""
    if init_pose is None:
        init_pose = jnp.zeros(3, dtype=src.dtype)

    if cfg.do_visibility_test:
        ref_valid = visibility_mask(ref, ref_valid, init_pose[:2])

    max_d2 = cfg.max_correspondence_dist**2
    max_ang = math.radians(cfg.max_angular_correction_deg)
    n_ref = ref.shape[0]
    fsrc = src_valid.astype(src.dtype)

    # fused VMEM correspondence kernel on TPU (the XLA chain makes ~8 HBM
    # passes over [B, B']); the alpha test reorders the doubles gating, so
    # that knob pins the XLA path
    method = cfg.correspondence_method
    if method == "auto":
        # the fused kernel is pallas.tpu-specific; any other backend
        # (cpu, gpu) takes the portable XLA chain.  Very wide scans
        # (> ~1300 beams padded) exceed the ~16 MB per-core VMEM with the
        # kernel's [B, B'] working set and fail at Mosaic compile time —
        # those fall back to the XLA chain (corr_vmem_fits).
        from tpuslam.ops.pallas_plicp import corr_vmem_fits

        method = (
            "pallas"
            if jax.default_backend() == "tpu"
            and corr_vmem_fits(src.shape[0], n_ref)
            else "xla"
        )
    # the alpha test reorders the doubles gating and the ml weights need
    # the matched ref point's fitted normal — both pin the XLA path
    use_fused = (
        method == "pallas"
        and not cfg.do_alpha_test
        and not cfg.use_ml_weights
    )

    if cfg.do_alpha_test or cfg.use_ml_weights:
        ref_alpha, ref_avalid = scan_orientations(
            ref, ref_valid, cfg.orientation_neighbourhood,
            cfg.clustering_threshold,
        )
    if cfg.do_alpha_test:
        src_alpha, src_avalid = scan_orientations(
            src, src_valid, cfg.orientation_neighbourhood,
            cfg.clustering_threshold,
        )

    def iteration(carry, _):
        pose, done = carry
        cur = se2.transform_points(pose, src)

        if use_fused:
            from tpuslam.ops.pallas_plicp import correspondences_pallas

            q1, q2, d1, ok = correspondences_pallas(
                cur, src_valid, ref, ref_valid,
                jnp.float32(max_d2), bool(cfg.outliers_remove_doubles),
            )
            return _finish_iteration(pose, done, cur, q1, q2, d1, ok)

        oh1, oh2, d1, ok = _correspondences(cur, src_valid, ref, ref_valid)
        ok = ok & (d1 < max_d2)

        if cfg.do_alpha_test:
            # CSM's orientation compatibility test: discard correspondences
            # whose source-surface normal (rotated by the current pose)
            # differs from the MATCHED reference point's normal by more
            # than the threshold, modulo pi.  Both normals come from the
            # cluster-bounded neighbourhood fit (scan_orientations) — the
            # clustering_threshold / orientation_neighbourhood knobs act
            # here.  Pairs where either fit is unsupported (< 3
            # same-cluster neighbours) pass untested, as in CSM.
            a_ref = jnp.dot(
                oh1, ref_alpha, precision=jax.lax.Precision.HIGHEST
            )
            av_ref = jnp.dot(
                oh1, ref_avalid.astype(src.dtype),
                precision=jax.lax.Precision.HIGHEST,
            ) > 0.5
            dalpha = (src_alpha + pose[2]) - a_ref
            cosang = jnp.abs(jnp.cos(dalpha))  # |cos| = mod-pi distance
            thresh = math.cos(
                math.radians(cfg.do_alpha_test_thresholdDeg)
            )
            both = src_avalid & av_ref
            ok = ok & (~both | (cosang >= thresh))

        if cfg.outliers_remove_doubles:
            # keep only the closest src per ref point: columnwise min of the
            # one-hot-masked distance matrix (the scatter-min, vectorized)
            dmat = jnp.where(
                (oh1 > 0) & ok[:, None], d1[:, None], BIG
            )
            best_per_ref = jnp.min(dmat, axis=0)  # [B']
            my_best = jnp.sum(oh1 * best_per_ref[None, :], axis=-1)
            ok = ok & (d1 <= my_best + 1e-12)

        q1 = jnp.dot(oh1, ref, precision=jax.lax.Precision.HIGHEST)
        q2 = jnp.dot(oh2, ref, precision=jax.lax.Precision.HIGHEST)

        factor = None
        if cfg.use_ml_weights:
            # PL-ICP's maximum-likelihood incidence weighting (the
            # use_ml_weights knob, plicp_odometry.cc:179-180): a beam
            # hitting a surface at incidence angle beta has its range
            # noise stretched 1/cos(beta) along the surface normal, so
            # the correspondence weight is cos^2(beta).  beta = matched
            # ref normal (neighbourhood fit) minus the beam's world
            # direction; pairs without a supported fit keep weight 1.
            a_ref = jnp.dot(
                oh1, ref_alpha, precision=jax.lax.Precision.HIGHEST
            )
            av_ref = jnp.dot(
                oh1, ref_avalid.astype(src.dtype),
                precision=jax.lax.Precision.HIGHEST,
            ) > 0.5
            beam = pose[2] + jnp.arctan2(src[:, 1], src[:, 0])
            factor = jnp.where(
                av_ref, jnp.cos(a_ref - beam) ** 2, 1.0
            ).astype(src.dtype)
        return _finish_iteration(pose, done, cur, q1, q2, d1, ok, factor)

    def _finish_iteration(pose, done, cur, q1, q2, d1, ok, factor=None):
        """Residual, trim, and the GN/point-to-point update — shared by the
        XLA and fused-Pallas correspondence paths.  ``factor`` carries the
        optional per-correspondence ml weight (incidence cos^2); it scales
        the normal system only — trim selection and the reported mean
        error stay distance-based, as in CSM's compute_next_estimate."""
        r, n = _point_line_residual(cur, q1, q2)
        dist = jnp.abs(r)

        # trim at the maxPerc quantile of valid distances + adaptive cut
        # (exact selection, no sort — _kth_smallest)
        n_ok = jnp.sum(ok)
        k = jnp.clip(
            (n_ok.astype(jnp.float32) * cfg.outliers_maxPerc).astype(jnp.int32),
            0,
            dist.shape[0] - 1,
        )
        thresh_perc = _kth_smallest(dist, ok, k)
        ka = jnp.clip(
            (n_ok.astype(jnp.float32) * cfg.outliers_adaptive_order).astype(
                jnp.int32
            ),
            0,
            dist.shape[0] - 1,
        )
        thresh_adap = cfg.outliers_adaptive_mult * _kth_smallest(dist, ok, ka)
        ok = ok & (dist <= jnp.maximum(jnp.minimum(thresh_perc, thresh_adap), 1e-9))

        w = (ok & src_valid).astype(src.dtype)
        # CSM's use_sigma_weights scales every weight by 1/sigma_i^2; the
        # node supplies no per-beam sigmas, so that is the uniform
        # cfg.sigma — it leaves the GN argmin unchanged, and the reported
        # covariance applies sigma^2 explicitly below.  The normal system
        # h is therefore built from the UNSCALED weights in both cases.
        wsys = w if factor is None else w * factor
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        px, py = src[:, 0], src[:, 1]
        drot = jnp.stack(
            [-s * px - c * py, c * px - s * py], axis=-1
        )  # d(R p)/dtheta
        if cfg.use_point_to_line_distance:
            # GN on r = n.(R p + t - q1): J = [nx, ny, n.(dR/dth p)]
            jth = jnp.sum(n * drot, axis=-1)
            jac = jnp.concatenate([n, jth[:, None]], axis=-1)  # [B, 3]
            h = jnp.einsum("bi,bj,b->ij", jac, jac, wsys)
            g = jnp.einsum("bi,b,b->i", jac, r, wsys)
            delta = -jnp.linalg.solve(h + 1e-9 * jnp.eye(3, dtype=h.dtype), g)
            new_pose = pose + delta
            new_pose = new_pose.at[2].set(se2.wrap_angle(new_pose[2]))
        else:
            # point-to-point fallback (use_point_to_line_distance = 0);
            # h = sum_i w_i J_i^T J_i over the 2-row residual
            # R p + t - q1 with J_i = [[1,0,dx],[0,1,dy]], d = d(Rp)/dth
            from tpuslam.match.icp import rigid_fit_2d

            delta_pose = rigid_fit_2d(cur, q1, wsys)
            new_pose = se2.compose(delta_pose, pose)
            delta = new_pose - pose
            # compose wraps the heading: near the +-pi boundary the raw
            # difference is ~2*pi and convergence would never be detected
            delta = delta.at[2].set(se2.wrap_angle(delta[2]))
            sw = jnp.sum(wsys)
            swd = jnp.einsum("b,bi->i", wsys, drot)
            swdd = jnp.einsum("b,bi,bi->", wsys, drot, drot)
            h = jnp.zeros((3, 3), src.dtype)
            h = h.at[0, 0].set(sw).at[1, 1].set(sw)
            h = h.at[0, 2].set(swd[0]).at[2, 0].set(swd[0])
            h = h.at[1, 2].set(swd[1]).at[2, 1].set(swd[1])
            h = h.at[2, 2].set(swdd)

        conv = (jnp.max(jnp.abs(delta[:2])) < cfg.epsilon_xy) & (
            jnp.abs(delta[2]) < cfg.epsilon_theta
        )
        new_pose = jnp.where(done, pose, new_pose)
        mean_err = jnp.sum(dist * w) / jnp.maximum(jnp.sum(w), 1.0)
        return (new_pose, done | conv), (jnp.sum(w), mean_err, h)

    def _run_iterations(start_pose):
        """CSM's early exit (epsilon_xy/theta) as a while_loop: converged
        pairs stop PAYING for further iterations instead of freezing
        through them — the correspondence kernel dominates the iteration
        cost, and typical matches converge in 3-5 of the 10 budgeted
        iterations.  After convergence is detected the loop runs exactly
        ONE more (pose-frozen) iteration so the reported stats and normal
        system describe the RETURNED pose — matching both CSM's
        report-at-converged-pose semantics and the frozen-scan
        formulation's final values.  Under vmap the loop runs until every
        pair in the batch confirms, converged pairs frozen by ``done``."""

        def cond(carry):
            _, _, confirmed, it, _, _, _ = carry
            return (it < cfg.max_iterations) & ~confirmed

        def body(carry):
            pose, done, _, it, _, _, _ = carry
            (new_pose, new_done), (n_w, mean_err, h) = iteration(
                (pose, done), None
            )
            return (new_pose, new_done, done, it + 1, n_w, mean_err, h)

        pose, _, _, _, n_last, err_last, h_last = jax.lax.while_loop(
            cond,
            body,
            (start_pose, jnp.zeros((), bool), jnp.zeros((), bool),
             jnp.int32(0), jnp.zeros((), src.dtype),
             jnp.zeros((), src.dtype), jnp.zeros((3, 3), src.dtype)),
        )
        return pose, n_last, err_last, h_last

    pose, n_last, err_last, h_last = _run_iterations(init_pose)

    if cfg.restart:
        # CSM restart semantics (icp_loop's restart knobs, surfaced by
        # plicp_odometry.cc:103-117): when the converged mean error exceeds
        # restart_threshold_mean_error, re-run the iterations from a guess
        # displaced by (restart_dt, restart_dt, restart_dtheta) and keep the
        # better of the two solutions.
        def do_restart(_):
            guess2 = init_pose + jnp.asarray(
                [cfg.restart_dt, cfg.restart_dt, cfg.restart_dtheta],
                init_pose.dtype,
            )
            p2, n2, e2, h2 = _run_iterations(guess2)
            better = e2 < err_last
            return (
                jnp.where(better, p2, pose),
                jnp.where(better, n2, n_last),
                jnp.where(better, e2, err_last),
                jnp.where(better, h2, h_last),
            )

        pose, n_last, err_last, h_last = jax.lax.cond(
            err_last > cfg.restart_threshold_mean_error,
            do_restart,
            lambda _: (pose, n_last, err_last, h_last),
            None,
        )

    # CSM clips corrections beyond the trust region and reports invalid
    within = (
        (jnp.abs(pose[0] - init_pose[0]) <= cfg.max_linear_correction)
        & (jnp.abs(pose[1] - init_pose[1]) <= cfg.max_linear_correction)
        & (jnp.abs(se2.wrap_angle(pose[2] - init_pose[2])) <= max_ang)
    )
    enough = n_last >= 3
    valid = within & enough
    pose = jnp.where(valid, pose, init_pose)

    if cfg.do_compute_covariance:
        # CSM compute_covariance_exact analog (surfaced by the
        # do_compute_covariance knob, plicp_odometry.cc:373-387): under
        # iid point noise sigma^2 the estimate covariance of the
        # least squares is sigma^2 * inv(J^T W J) at the converged pose.
        # h_last is the normal system of the loop's CONFIRM pass — built
        # at the returned pose with the exact weighting (trim, adaptive
        # cut, doubles, alpha test, ml factors) that produced it, so the
        # covariance describes the same system as the estimate.
        cov = jnp.asarray(cfg.sigma**2, src.dtype) * jnp.linalg.inv(
            h_last + 1e-9 * jnp.eye(3, dtype=src.dtype)
        )
        cov = jnp.where(valid, cov, jnp.eye(3, dtype=src.dtype) * 1e6)
    else:
        cov = jnp.eye(3, dtype=src.dtype)
    return PlicpResult(
        pose=pose,
        valid=valid,
        mean_error=err_last,
        num_inliers=n_last.astype(jnp.int32),
        covariance=cov,
    )


@partial(jax.jit, static_argnames=("cfg",))
def plicp_batch(
    cfg: PlicpConfig,
    src: Array,
    src_valid: Array,
    ref: Array,
    ref_valid: Array,
    init_poses: Array,
) -> PlicpResult:
    """vmapped PL-ICP over scan pairs [N, B, 2] (batched odometry)."""
    return jax.vmap(partial(plicp, cfg))(src, src_valid, ref, ref_valid, init_poses)
