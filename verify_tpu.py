"""On-hardware Pallas verification: Mosaic-compiled kernels vs oracles.

CI (tests/) forces a CPU backend, where both Pallas kernels run in
interpreter mode — faithful to the primitives but NOT to the Mosaic
compiler.  Two real divergences were found only by manual on-hardware
checks (negative dynamic ``pltpu.roll`` mis-rotating by +16 on
non-power-of-two dims; bf16 dynamic rolls crashing the compiler — see
ops/pallas_correlative.py and TODO.md).  This script turns that
discipline into a runnable gate: it executes both production kernels
Mosaic-compiled at every production operating size and bit-checks them
against independent oracles.  Run it on the bench chip before any BENCH
capture:

    python verify_tpu.py          # exits non-zero on any mismatch

Covered:
- the module-level Mosaic roll-semantics self-check (pallas_correlative
  ``_roll_selfcheck`` — fails loudly if a jaxlib/Mosaic update changes
  dynamic roll lowering),
- ``patch_sums_pallas`` vs a NumPy patch-sum oracle at the sequential
  0.01 m indoor grid, the outdoor 0.05 m sequential grid, and the 15 m
  loop grid, each at 512 and 1081 beams (the real lidar sizes),
- ``correspondences_pallas`` / ``nearest_pallas`` vs a NumPy brute-force
  correspondence oracle at 512 and 1081 beams,
- ``vmem_fits`` tells the truth: every size it approves must actually
  compile and run on this chip.
"""

from __future__ import annotations

import sys

import numpy as np


def _numpy_patch_sums(grid, ay, ax, s):
    g = grid.shape[0]
    big = np.zeros((g + s + 16, g + s + 128), np.float64)
    big[:g, :g] = np.round(np.asarray(grid, np.float64) * 100.0)
    n_a, b = ay.shape
    out = np.zeros((n_a, s, s), np.float64)
    for a in range(n_a):
        for p in range(b):
            out[a] += big[ay[a, p] : ay[a, p] + s, ax[a, p] : ax[a, p] + s]
    return out.astype(np.float32)


def _numpy_correspondences(cur, sv, ref, rv, max_d2, remove_doubles):
    """Brute-force port of the kernel contract (CSM find_correspondences
    + kill_outliers_double semantics, ops/pallas_plicp.py module doc)."""
    b, n_ref = cur.shape[0], ref.shape[0]
    d2 = np.sum((cur[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
    d2 = np.where(rv[None, :] & sv[:, None], d2, 1e9)
    j1 = np.argmin(d2, axis=1)
    d1 = d2[np.arange(b), j1]
    d_r = np.where(j1 == n_ref - 1, 1e9, d2[np.arange(b), (j1 + 1) % n_ref])
    d_l = np.where(j1 == 0, 1e9, d2[np.arange(b), j1 - 1])
    j2 = np.where(d_r < d_l, j1 + 1, j1 - 1)
    ok = (d1 < 1e9) & (np.minimum(d_r, d_l) < 1e9) & (d1 < max_d2)
    if remove_doubles:
        best = np.full(n_ref, 1e9)
        for i in range(b):
            if ok[i] and d1[i] < best[j1[i]]:
                best[j1[i]] = d1[i]
        ok = ok & (d1 <= best[j1] + 1e-12)
    q1 = ref[j1]
    q2 = ref[np.clip(j2, 0, n_ref - 1)]
    return q1, q2, d1, ok


def main() -> int:
    import os

    import jax
    import jax.numpy as jnp

    # reuse the CLI's persistent compilation cache — this gate compiles a
    # dozen Mosaic programs, minutes cold but seconds warm
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("TPUSLAM_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/tpuslam-xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    failures = 0

    def check(name, cond, detail=""):
        nonlocal failures
        status = "PASS" if cond else "FAIL"
        print(f"[{status}] {name} {detail}")
        if not cond:
            failures += 1

    if jax.default_backend() != "tpu":
        print(
            "ERROR: no TPU backend "
            f"(default_backend={jax.default_backend()}); this gate only "
            "means something Mosaic-compiled"
        )
        return 2

    from tpuslam.ops.pallas_correlative import (
        _roll_selfcheck,
        patch_sums_pallas,
        vmem_fits,
    )

    # ---- 1. Mosaic roll semantics
    try:
        _roll_selfcheck()
        check("mosaic roll self-check", True)
    except RuntimeError as e:
        check("mosaic roll self-check", False, str(e))

    # ---- 2. patch_sums at production sizes
    # (grid side G, patch side S) for: indoor sequential (0.3 m @ 0.01,
    # threshold 12 m), outdoor sequential (0.3 m @ 0.05, threshold 50 m),
    # outdoor loop (15 m @ 0.1, threshold 50 m -> capped by VMEM rule),
    # and the coarse-to-fine fine pass (S=3 window)
    sizes = [
        ("seq-indoor", 2431, 33),
        ("seq-outdoor", 2007, 9),
        ("loop-15m", 1151, 153),
        ("fine-pass", 2431, 5),
    ]
    rng = np.random.default_rng(0)
    for n_beams in (512, 1081):
        for name, g, s in sizes:
            if not vmem_fits(g, s):
                check(f"vmem_fits({name})", False,
                      f"g={g} s={s} rejected — production size must fit")
                continue
            n_a = 21
            grid = (
                rng.integers(0, 101, (g, g)).astype(np.float32) / 100.0
            )
            # sparse occupancy is the real shape; dense random is stricter
            ay = rng.integers(0, g - s + 1, (n_a, n_beams)).astype(np.int32)
            ax = rng.integers(0, g - s + 1, (n_a, n_beams)).astype(np.int32)
            drop = rng.random((n_a, n_beams)) < 0.1
            ay = np.where(drop, g, ay).astype(np.int32)
            ax = np.where(drop, 0, ax).astype(np.int32)
            got = np.asarray(
                patch_sums_pallas(jnp.asarray(grid), ay, ax, s)
            )
            want = _numpy_patch_sums(grid, ay, ax, s)
            eq = np.array_equal(got, want)
            check(
                f"patch_sums {name} B={n_beams}", eq,
                f"g={g} s={s} maxdiff="
                f"{np.abs(got - want).max() if not eq else 0}",
            )

    # ---- 3. PL-ICP correspondence kernel
    from tpuslam.ops.pallas_plicp import (
        corr_vmem_fits,
        correspondences_pallas,
        nearest_pallas,
    )

    # the production beam counts must take the kernel; very wide scans
    # must be REJECTED by the gate (1536-padded measured 19.6 M scoped
    # VMEM > the 16 M limit — a compile failure if the gate ever lets
    # them through)
    check("corr_vmem_fits(512)", corr_vmem_fits(512, 512))
    check("corr_vmem_fits(1081)", corr_vmem_fits(1081, 1081))
    check("corr_vmem_fits rejects 1440", not corr_vmem_fits(1440, 1440))

    for n_beams in (512, 1081):
        cur = rng.normal(0, 2.0, (n_beams, 2)).astype(np.float32)
        ref = rng.normal(0, 2.0, (n_beams, 2)).astype(np.float32)
        sv = rng.random(n_beams) > 0.1
        rv = rng.random(n_beams) > 0.1
        for rd in (False, True):
            q1, q2, d1, ok = (
                np.asarray(x)
                for x in correspondences_pallas(
                    jnp.asarray(cur), jnp.asarray(sv), jnp.asarray(ref),
                    jnp.asarray(rv), jnp.float32(1.0), rd,
                )
            )
            wq1, wq2, wd1, wok = _numpy_correspondences(
                cur.astype(np.float64), sv, ref.astype(np.float64), rv,
                1.0, rd,
            )
            eq = (
                np.array_equal(ok, wok)
                and np.allclose(d1[ok], wd1[ok], rtol=1e-6, atol=1e-7)
                and np.array_equal(q1[ok], wq1[ok].astype(np.float32))
                and np.array_equal(q2[ok], wq2[ok].astype(np.float32))
            )
            check(f"correspondences B={n_beams} doubles={rd}", eq)
        q1, d1, ok = (
            np.asarray(x)
            for x in nearest_pallas(
                jnp.asarray(cur), jnp.asarray(sv), jnp.asarray(ref),
                jnp.asarray(rv), jnp.float32(1.0),
            )
        )
        wq1, _, wd1, wok = _numpy_correspondences(
            cur.astype(np.float64), sv, ref.astype(np.float64), rv, 1.0,
            False,
        )
        # nearest mode has no line-neighbor requirement
        d2m = np.sum(
            (cur.astype(np.float64)[:, None] - ref[None]) ** 2, -1
        )
        d2m = np.where(rv[None, :] & sv[:, None], d2m, 1e9)
        wok = (d2m.min(1) < 1e9) & (d2m.min(1) < 1.0)
        eq = np.array_equal(ok, wok) and np.array_equal(
            q1[ok], wq1[ok].astype(np.float32)
        )
        check(f"nearest (ICP) B={n_beams}", eq)

    # ---- 3b. the scans-in-lanes FindValidPoints walk (ops/pallas_fvp.py)
    # must be bit-identical to the vmapped serial scan, Mosaic-compiled at
    # the production operating points (seq buffer, link chain, loop chain)
    from tpuslam.match.correlative import find_valid_points
    from tpuslam.ops.pallas_fvp import find_valid_points_batch

    rng = np.random.default_rng(23)
    for s_chain, n_beams in ((20, 180), (8, 512), (128, 1081)):
        th = np.sort(rng.uniform(-np.pi, np.pi, n_beams))
        rr = np.abs(rng.normal(8, 6, (s_chain, n_beams))).clip(0.11, 50)
        pts = np.stack([rr * np.cos(th), rr * np.sin(th)], -1)
        pts += rng.normal(0, 0.5, (s_chain, 1, 2))
        valid = rng.uniform(size=(s_chain, n_beams)) > 0.2
        if s_chain > 2:
            valid[1] = False  # an all-invalid chain row
        vp = jnp.asarray(rng.normal(0, 1, 2), jnp.float32)
        jp = jnp.asarray(pts, jnp.float32)
        jv = jnp.asarray(valid)
        want = np.asarray(
            jax.vmap(
                lambda p, v: find_valid_points(p, v, vp, parallel=False)
            )(jp, jv)
        )
        got = np.asarray(find_valid_points_batch(jp, jv, vp))
        check(
            f"pallas fvp S={s_chain} B={n_beams}",
            np.array_equal(got, want),
            f"{int((got != want).sum())} mask diffs",
        )

    # ---- 4. end-to-end: a full MatchScan must be bit-identical between
    # the pallas response method and the XLA fft/patch methods on-TPU
    import dataclasses

    from tpuslam.core import se2
    from tpuslam.core.scan import make_scan, scan_to_points
    from tpuslam.io.simulate import simulate_scan, world_with_boxes
    from tpuslam.match.correlative import CorrelativeSpec, match_scan

    world = world_with_boxes()
    spec0 = CorrelativeSpec(
        resolution=0.02, search_dim=0.32, smear_deviation=0.04,
        range_threshold=6.0,
    )
    base_pose = np.array([0.05, 0.02, 0.03], np.float32)
    r, amin, ainc = simulate_scan(world, base_pose, num_beams=512,
                                  max_range=30.0)
    bscan = make_scan(r, angle_min=amin, angle_increment=ainc,
                      range_min=0.1, range_max=30.0, num_beams=512)
    bpts, bv = scan_to_points(bscan)
    bv = bv & (bscan.ranges <= 6.0)
    wpts = se2.transform_points(base_pose, bpts)
    qpose = np.array([0.31, 0.07, 0.09], np.float32)
    r2, amin2, ainc2 = simulate_scan(world, qpose, num_beams=512,
                                     max_range=30.0)
    qscan = make_scan(r2, angle_min=amin2, angle_increment=ainc2,
                      range_min=0.1, range_max=30.0, num_beams=512)
    qpts, qv = scan_to_points(qscan)
    qv = qv & (qscan.ranges <= 6.0)
    center = jnp.asarray(qpose + np.array([0.04, -0.03, 0.02], np.float32))
    results = {}
    for meth in ("pallas", "fft", "patch"):
        sp = dataclasses.replace(spec0, response_method=meth)
        res = match_scan(sp, center, qpts, qv, wpts[None], bv[None])
        results[meth] = (
            float(res.response), np.asarray(res.pose),
            np.asarray(res.covariance),
        )
    for meth in ("fft", "patch"):
        eq = (
            results["pallas"][0] == results[meth][0]
            and np.array_equal(results["pallas"][1], results[meth][1])
            and np.allclose(results["pallas"][2], results[meth][2],
                            rtol=1e-5, atol=1e-7)
        )
        check(f"match_scan pallas == {meth}", eq,
              f"resp {results['pallas'][0]:.6f} vs {results[meth][0]:.6f}")

    print(f"\n{failures} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
