"""Probe: pallas vs patch vs conv/fft correlative response on the real TPU.

Measures the standalone sequential match (0.01 m spec) and the karto
pipeline spec (0.02 m), per response method.  Not part of the suite —
a one-off measurement tool.
"""

import dataclasses
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tpuslam.core import se2
from tpuslam.core.scan import make_scan, scan_to_points
from tpuslam.io.simulate import rect_room, simulate_scan
from tpuslam.match.correlative import CorrelativeSpec, match_scan
from tpuslam.ops.pallas_correlative import vmem_fits

print("backend:", jax.default_backend())

segs = rect_room(8.0, 6.0)
r, amin, ainc = simulate_scan(segs, np.zeros(3), num_beams=512, max_range=20.0)
sc = make_scan(r, angle_min=amin, angle_increment=ainc, range_min=0.1,
               range_max=20.0, num_beams=512)
pts, valid = scan_to_points(sc)
wpts = se2.transform_points(jnp.zeros(3), pts)

SPECS = {
    "seq_0.01m": CorrelativeSpec(resolution=0.01, search_dim=0.3,
                                 smear_deviation=0.03, range_threshold=12.0),
    "karto_0.02m": CorrelativeSpec(resolution=0.02, search_dim=0.32,
                                   smear_deviation=0.04, range_threshold=6.0),
}


def timed(fn, iters=20):
    jax.device_get(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn())
    return (time.perf_counter() - t0) / iters


for name, spec in SPECS.items():
    half = spec.search_side // 2 + 1
    size = 2 * half + 1
    print(f"--- {name}: grid={spec.grid_size} patch={size} "
          f"vmem_fits={vmem_fits(spec.grid_size, size)}")
    for method in ("patch", "pallas", "fft"):
        s = dataclasses.replace(spec, response_method=method)

        def one(s=s):
            return match_scan(s, jnp.zeros(3), pts, valid, wpts[None],
                              valid[None]).pose

        try:
            dt = timed(one)
            print(f"  {method:8s} {dt * 1e3:8.2f} ms/match "
                  f"({1.0 / dt:7.1f}/s)")
        except Exception as e:  # noqa: BLE001
            print(f"  {method:8s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
