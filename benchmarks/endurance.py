"""Endurance differential run: >=1,500 lossy multi-loop scans through the
FULL batched+pipelined KartoMapper vs the reference-exact f64 OracleMapper.

This is the long-stream companion of test_oracle_parity's pipeline-parity
tests: it drives ``Mapper::Process`` end-to-end semantics
(/root/reference/lesson6/lib/open_karto/src/Mapper.cpp:1999-2079) over many
loop closures and checks that the documented f32-vs-f64 deviation class
does NOT compound with stream length:

- accept/reject decisions agree scan-for-scan (gating is odometry/time
  only — any disagreement makes the trajectories incomparable),
- loop-closure EPISODES agree: every closure on either side has a closure
  on the other side within EPISODE_SLACK scans (the batch path defers
  chain re-discovery by up to one flush, models/karto.py:981-1022, and a
  near-threshold response resolving one f32 ulp apart can shift a
  re-close by a few scans inside the same revisit episode; episodes
  themselves must never appear or vanish),
- closure COUNTS stay within a small relative band (each episode fires a
  burst of re-closes whose exact length is tie-sensitive at 15% dropout),
- the pose deviation is bounded and NON-GROWING: per-third medians stay
  in the one-fine-cell class and the final third's median does not
  exceed the first third's by more than one fine cell; the worst
  deviation over the whole stream stays under ~one loop-search cell.

Run:  python benchmarks/endurance.py [--scans 1536] [--out ENDURANCE.json]
The in-suite test (tests/test_oracle_parity.py::test_endurance_lossy_
multiloop) runs this exact harness when TPUSLAM_ENDURANCE=1 (it takes
~10 CPU-minutes, far beyond the default suite budget; the recorded
artifact + PARITY.md quote the bounds at HEAD).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

EPISODE_SLACK = 32  # scans: two flushes (batch_size) either way — one flush
# of batch-path chain re-discovery deferral (models/karto.py:981-1022) plus
# one flush of tie-shifted re-close timing inside a revisit episode
# (observed worst offset over 2x98 closure events at 1536 scans: 20)
COUNT_BAND = 0.2  # relative closure-count tolerance between the sides


def endurance_cfg(nb: int):
    """The realistic-course karto config (mapper_params-style loop knobs)."""
    from tpuslam.core.config import KartoConfig

    return KartoConfig(
        num_beams=nb, use_scan_range=10.0,
        minimum_travel_distance=0.2, minimum_travel_heading=0.174,
        minimum_time_interval=3600.0,
        scan_buffer_size=20, scan_buffer_maximum_scan_distance=10.0,
        correlation_search_space_dimension=0.32,
        correlation_search_space_resolution=0.02,
        correlation_search_space_smear_deviation=0.04,
        loop_search_space_dimension=4.0, loop_search_space_resolution=0.1,
        loop_search_space_smear_deviation=0.1,
        loop_search_maximum_distance=1.5, loop_match_minimum_chain_size=4,
        loop_match_maximum_variance_coarse=0.4,
        loop_match_minimum_response_coarse=0.5,
        loop_match_minimum_response_fine=0.5,
        link_match_minimum_response_fine=0.6,
        link_scan_maximum_distance=1.5,
        do_loop_closing=True,
    )


def _episode_ok(a, b):
    """Every event in ``a`` has an event in ``b`` within EPISODE_SLACK."""
    a, b = np.asarray(a), np.asarray(b)
    if len(a) == 0 or len(b) == 0:
        return len(a) == len(b)
    return bool(
        (np.abs(a[:, None] - b[None, :]).min(axis=1) <= EPISODE_SLACK).all()
    )


def run_endurance(
    n_scans: int = 1536,
    nb: int = 120,
    batch_size: int = 16,
    pipeline: int = 4,
    seed: int = 11,
) -> dict:
    """Run both engines on the identical stream; return the comparison."""
    from tpuslam.core.scan import make_scan
    from tpuslam.io.simulate import lossy_garland_stream
    from tpuslam.models.karto import KartoMapper
    from tpuslam.oracle import OracleMapper, OracleScan

    cfg = endurance_cfg(nb)
    trues, metas, odoms, _ = lossy_garland_stream(
        num_scans=n_scans, num_beams=nb, seed=seed
    )
    n_scans = len(metas)
    scans = [
        make_scan(r, angle_min=amin, angle_increment=ainc,
                  range_min=0.1, range_max=30.0, num_beams=nb)
        for r, amin, ainc in metas
    ]

    t0 = time.perf_counter()
    m = KartoMapper(cfg, max_scans=n_scans + 64)
    res = m.process_batch(scans, odoms, batch_size=batch_size,
                          pipeline=pipeline)
    t_tpuslam = time.perf_counter() - t0
    t_events = [i for i, r in enumerate(res) if r.loop_closed]

    t0 = time.perf_counter()
    om = OracleMapper(cfg)
    o_events: list[int] = []
    accept_mismatches = []
    proc_set = {i for i, r in enumerate(res) if r.processed}
    prev = 0
    for i in range(n_scans):
        r, amin, ainc = metas[i]
        processed = om.process(OracleScan(
            r, amin, ainc, range_threshold=cfg.use_scan_range,
            minimum_range=0.1, odom_pose=odoms[i],
        ))
        if processed != (i in proc_set):
            accept_mismatches.append(i)
        if om.loop_closures > prev:
            o_events.extend([i] * (om.loop_closures - prev))
            prev = om.loop_closures
    t_oracle = time.perf_counter() - t0

    n = len(m.records)
    op = np.stack([s.corrected_pose for s in om.scans])
    k = min(n, len(op))
    tp = np.asarray(m.poses[:k], np.float64)
    dev = np.sqrt(np.sum((tp[:, :2] - op[:k, :2]) ** 2, axis=1))
    thirds = np.array_split(dev, 3)

    # accuracy-vs-TRUTH per third for BOTH engines: the direct
    # non-compounding statement.  The pairwise engine-vs-engine deviation
    # can random-walk (each lossy near-tie resolves independently and
    # shifts that engine's MAP by a fine cell), but if f32 error
    # compounded, the tpuslam ATE would grow while the f64 oracle's
    # stayed flat — so the tracked bound is the per-third ATE GAP.
    proc_idx = sorted(proc_set)
    tt = trues[proc_idx][:k, :2]
    et = np.sqrt(np.sum((tp[:, :2] - tt) ** 2, axis=1))
    eo = np.sqrt(np.sum((op[:k, :2] - tt) ** 2, axis=1))
    ate_t = [float(np.sqrt(np.mean(x**2))) for x in np.array_split(et, 3)]
    ate_o = [float(np.sqrt(np.mean(x**2))) for x in np.array_split(eo, 3)]

    return {
        "n_scans": n_scans,
        "n_processed": n,
        "n_processed_oracle": int(len(op)),
        "accept_mismatches": accept_mismatches,
        "closures_tpuslam": int(m.stats["loop_closures"]),
        "closures_oracle": int(om.loop_closures),
        "closure_events_tpuslam": t_events,
        "closure_events_oracle": o_events,
        "episodes_covered_t_in_o": _episode_ok(t_events, o_events),
        "episodes_covered_o_in_t": _episode_ok(o_events, t_events),
        "dev_median_thirds": [float(np.median(t)) for t in thirds],
        "dev_max_thirds": [float(t.max()) for t in thirds],
        "dev_max": float(dev.max()),
        "ate_rmse_thirds_tpuslam": ate_t,
        "ate_rmse_thirds_oracle": ate_o,
        "fine_resolution": cfg.correlation_search_space_resolution,
        "loop_resolution": cfg.loop_search_space_resolution,
        "batch_size": batch_size,
        "pipeline": pipeline,
        "seconds_tpuslam": t_tpuslam,
        "seconds_oracle": t_oracle,
        "backend": __import__("jax").default_backend(),
    }


def check_endurance(r: dict) -> None:
    """The assertions the in-suite test makes (shared so the artifact run
    proves exactly what the test would)."""
    assert r["n_scans"] >= 1500, r["n_scans"]
    assert not r["accept_mismatches"], r["accept_mismatches"][:5]
    assert r["n_processed"] == r["n_processed_oracle"]
    assert r["closures_oracle"] >= 5, r["closures_oracle"]
    # recomputed from the event lists (not the stored booleans) so the
    # check always reflects THIS module's EPISODE_SLACK
    te, oe = r["closure_events_tpuslam"], r["closure_events_oracle"]
    assert _episode_ok(te, oe) and _episode_ok(oe, te), (te, oe)
    hi = max(r["closures_tpuslam"], r["closures_oracle"])
    lo = min(r["closures_tpuslam"], r["closures_oracle"])
    assert hi - lo <= max(2, COUNT_BAND * hi), (lo, hi)
    res = r["fine_resolution"]
    meds = r["dev_median_thirds"]
    # the bulk deviation stays in the one-fine-cell f32/f64 tie class
    # throughout, and does NOT grow front-to-back beyond one fine cell
    assert all(mm <= 1.5 * res for mm in meds), meds
    assert meds[-1] <= meds[0] + res, meds
    # worst-case single-pose deviation stays under ~1.25 loop cells
    assert r["dev_max"] <= 1.25 * r["loop_resolution"], r["dev_max"]
    # accuracy vs TRUTH: both engines' per-third ATE agree within half a
    # fine cell and the gap does not grow front-to-back — the direct
    # f32-error-does-not-compound statement (the pairwise deviation above
    # can random-walk one tie at a time; the truth-frame gap cannot)
    gaps = [abs(a - b) for a, b in zip(r["ate_rmse_thirds_tpuslam"],
                                       r["ate_rmse_thirds_oracle"])]
    assert all(gp <= 0.5 * res for gp in gaps), gaps
    assert gaps[-1] <= gaps[0] + 0.5 * res, gaps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=1536)
    ap.add_argument("--beams", type=int, default=120)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of forcing CPU")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not args.tpu:
        # force CPU in-process (a JAX_PLATFORMS shell var hangs plugin
        # init in this environment; tests/conftest.py does the same)
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    r = run_endurance(n_scans=args.scans, nb=args.beams)
    print(json.dumps(r))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(r, indent=1) + "\n")
    check_endurance(r)
    print("ENDURANCE CHECKS PASSED")


if __name__ == "__main__":
    main()
