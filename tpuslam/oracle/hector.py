"""Reference-exact float64 oracle of the hector GN scan matcher.

Scalar NumPy port of the reference's matcher contract, preserving its
exact op order and quirks:

- ``interpMapValueWithDerivatives`` (OccGridMapUtil.h:139-228): bilinear
  value + gradient with the repo's CORRECTED dx/dy factor pairing (the
  file keeps upstream hector's buggy lines commented out and returns the
  fixed ``-(dx1*yFacInv + dx2*fy)`` / ``-(dy1*xFacInv + dy2*fx)`` form);
  out-of-bounds points return (0, 0, 0) (OccGridMapUtil.h:141-144).
- ``getCompleteHessianDerivs`` (OccGridMapUtil.h:77-137): per-point
  residual 1 - M(Pm), rotational derivative, upper-triangle H built then
  symmetrized.
- ``estimateTransformationLogLh`` (ScanMatcher.h:110-140): update only
  when H(0,0) != 0 and H(1,1) != 0, searchDir = H^-1 dTr, yaw component
  clamped to +/-0.2 rad.
- ``matchData`` (ScanMatcher.h:62-100): ONE initial iteration plus
  maxIterations loop iterations (maxIterations + 1 total), final angle
  normalization, and H itself reported as the covariance.

Inputs are in the reference's working units: scan points in MAP-CELL
units of the level being matched (DataPointContainer.h:46-58 pre-scales
by 1/resolution) and poses in map coordinates.  Used by
tests/test_oracle_parity.py to differential-test match/hector.py.
"""

from __future__ import annotations

import math

import numpy as np


class OracleHectorMatcher:
    """float64 matchData for one pyramid level of ``prob_grid[y, x]``."""

    def __init__(self, prob_grid: np.ndarray):
        self.grid = np.asarray(prob_grid, np.float64)

    # OccGridMapUtil.h:139-228
    def interp_with_derivs(self, x: float, y: float):
        h, w = self.grid.shape
        # pointOutOfMapBounds + the interp's own x0+1/y0+1 reads: usable
        # interior is [0, size-1) on each axis
        if not (0.0 <= x and x < w - 1 and 0.0 <= y and y < h - 1):
            return 0.0, 0.0, 0.0
        x0 = int(x)
        y0 = int(y)
        fx = x - x0
        fy = y - y0
        p00 = self.grid[y0, x0]
        p10 = self.grid[y0, x0 + 1]
        p01 = self.grid[y0 + 1, x0]
        p11 = self.grid[y0 + 1, x0 + 1]
        dx1 = p00 - p10
        dx2 = p01 - p11
        dy1 = p00 - p01
        dy2 = p10 - p11
        xfi = 1.0 - fx
        yfi = 1.0 - fy
        val = (p00 * xfi + p10 * fx) * yfi + (p01 * xfi + p11 * fx) * fy
        gx = -(dx1 * yfi + dx2 * fy)
        gy = -(dy1 * xfi + dy2 * fx)
        return val, gx, gy

    # OccGridMapUtil.h:77-137
    def complete_hessian_derivs(self, pose: np.ndarray, pts: np.ndarray):
        s, c = math.sin(pose[2]), math.cos(pose[2])
        hess = np.zeros((3, 3), np.float64)
        dtr = np.zeros(3, np.float64)
        for px, py in np.asarray(pts, np.float64):
            tx = c * px - s * py + pose[0]
            ty = s * px + c * py + pose[1]
            val, gx, gy = self.interp_with_derivs(tx, ty)
            fun = 1.0 - val
            rot = (-s * px - c * py) * gx + (c * px - s * py) * gy
            dtr[0] += gx * fun
            dtr[1] += gy * fun
            dtr[2] += rot * fun
            hess[0, 0] += gx * gx
            hess[1, 1] += gy * gy
            hess[2, 2] += rot * rot
            hess[0, 1] += gx * gy
            hess[0, 2] += gx * rot
            hess[1, 2] += gy * rot
        hess[1, 0] = hess[0, 1]
        hess[2, 0] = hess[0, 2]
        hess[2, 1] = hess[1, 2]
        return hess, dtr

    # ScanMatcher.h:110-140
    def estimate_once(self, est: np.ndarray, pts: np.ndarray):
        hess, dtr = self.complete_hessian_derivs(est, pts)
        if hess[0, 0] != 0.0 and hess[1, 1] != 0.0:
            search = np.linalg.inv(hess) @ dtr
            if search[2] > 0.2:
                search[2] = 0.2
            elif search[2] < -0.2:
                search[2] = -0.2
            est = est + search
        return est, hess

    # ScanMatcher.h:62-100 (map coords in, map coords out)
    def match(self, begin_map: np.ndarray, pts: np.ndarray,
              max_iterations: int):
        est = np.asarray(begin_map, np.float64).copy()
        if len(pts) == 0:
            return est, np.zeros((3, 3))
        est, hess = self.estimate_once(est, pts)  # the initial iteration
        for _ in range(max_iterations):
            est, hess = self.estimate_once(est, pts)
        est[2] = math.atan2(math.sin(est[2]), math.cos(est[2]))
        return est, hess
