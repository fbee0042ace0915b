"""Sharded correlative (x, y, θ) lattice search over a device mesh.

The karto loop matcher enumerates a dense candidate lattice — at the
reference's outdoor operating point (15 m @ 0.1 m window, ±20°,
mapper_params_outdoor.yaml:33-37) that is 151×151×21 coarse candidates
against >1000-beam scans, the hottest loop in the reference
(Mapper.cpp:309-523 CorrelateScan).  SURVEY §5 names this lattice as the
one axis worth sharding: a CP-flavored decomposition where each device
owns a slice of the **angle** axis (the per-angle response surfaces are
fully independent), and the final tie-averaged argmax plus the
response-weighted covariance moments become cross-device reductions.

TPU-native mechanics: no hand-written collectives.  The candidate angle
array is laid out with ``NamedSharding(mesh, P(axis))``; XLA's SPMD
partitioner propagates that sharding through the per-angle rotation,
indicator scatter, and FFT/patch response computation, and inserts the
``all-reduce`` (max for the best response, sums for tie averaging and
covariance moments) over ICI.  Numerics are bit-identical to the
single-device :func:`tpuslam.match.correlative.match_scan`: padding
angles (to make the axis divisible by the mesh) carry a ``-1`` response
sentinel that can never win the max, join a tie, or pass the covariance
weight threshold.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuslam.match.correlative import (
    CorrelativeResult,
    CorrelativeSpec,
    _angular_covariance,
    _correlate,
    _positional_covariance,
    build_correlation_grid,
    find_valid_points,
)

Array = jax.Array


def _pad_angles(angles: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad an angle-offset array to a multiple of n; mask marks real entries."""
    pad = (-len(angles)) % n
    mask = np.concatenate([np.ones(len(angles), bool), np.zeros(pad, bool)])
    padded = np.concatenate(
        [angles, np.full(pad, angles[-1], angles.dtype)]
    ).astype(np.float32)
    return padded, mask


def make_sharded_match_scan(
    spec: CorrelativeSpec,
    mesh: Mesh,
    axis: str = "lattice",
    *,
    penalize: bool = True,
    refine: bool = True,
):
    """Build a jitted MatchScan with the coarse/fine angle lattice sharded
    over ``mesh[axis]``.

    Returns ``fn(center_pose, local_pts, valid, base_pts, base_valid) ->
    CorrelativeResult`` with the same semantics (and bit-exact results) as
    :func:`tpuslam.match.correlative.match_scan`.
    """
    base_spec = spec
    n = mesh.shape[axis]
    coarse_a, coarse_m = _pad_angles(spec.coarse_angles(), n)
    expansions = tuple(
        _pad_angles(spec.coarse_angles(math.radians(e)), n)
        for e in (20.0, 40.0, 60.0)
    )
    fine_a, fine_m = _pad_angles(spec.fine_angles(), n)

    ang = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def body(center_pose, local_pts, valid, base_pts, base_valid, angles):
        if base_spec.response_method in ("auto", "pallas", "conv"):
            # GSPMD cannot partition an opaque pallas_call/giant-kernel
            # conv along the angle axis — pin an XLA-partitionable
            # response method, sized with the ACTUAL beam count (the
            # loop-scale windows this sharding targets are FFT territory)
            import dataclasses as _dc

            half = int(round(float(np.max(np.abs(base_spec.coarse_xy())))
                             / base_spec.resolution)) + 1
            size = 2 * half + 1
            patch_bytes = (len(base_spec.coarse_angles())
                           * local_pts.shape[0] * size * size * 4)
            spec = _dc.replace(
                base_spec,
                response_method=(
                    "fft" if patch_bytes > 192 * 1024 * 1024 else "patch"
                ),
            )
        else:
            spec = base_spec
        (ca, cm), exp_aw, (fa, fm) = angles
        vp_valid = jax.vmap(
            lambda p, v: find_valid_points(p, v, center_pose[:2])
        )(
            base_pts.reshape(-1, base_pts.shape[-2], 2),
            base_valid.reshape(-1, base_valid.shape[-1]),
        )
        grid = build_correlation_grid(
            spec, center_pose[:2], base_pts, vp_valid.reshape(base_valid.shape)
        )
        grid_center = center_pose[:2]
        cxy = spec.coarse_xy()
        resp, best, mean = _correlate(
            spec, grid, grid_center, center_pose, local_pts, valid, cxy,
            ca, penalize, angle_mask=cm,
        )
        cov_pos = _positional_covariance(
            spec, resp, best, mean, center_pose, cxy
        )

        if spec.use_response_expansion:

            def expand(args):
                best_e, mean_e, cov_e = args
                for ea, em in exp_aw:
                    resp_x, best_x, mean_x = _correlate(
                        spec, grid, grid_center, center_pose, local_pts,
                        valid, cxy, ea, penalize, angle_mask=em,
                    )
                    cov_x = _positional_covariance(
                        spec, resp_x, best_x, mean_x, center_pose, cxy
                    )
                    use = best_e == 0.0
                    best_e = jnp.where(use, best_x, best_e)
                    mean_e = jnp.where(use, mean_x, mean_e)
                    cov_e = jnp.where(use, cov_x, cov_e)
                return best_e, mean_e, cov_e

            best, mean, cov_pos = jax.lax.cond(
                best == 0.0, expand, lambda args: args, (best, mean, cov_pos)
            )

        if refine:
            fxy = spec.fine_xy()
            _, best_f, mean_f = _correlate(
                spec, grid, grid_center, mean, local_pts, valid, fxy,
                fa, penalize, angle_mask=fm,
            )
            var_th = _angular_covariance(
                spec, grid, grid_center, mean, local_pts, valid, mean_f,
                best_f, fa, angle_mask=fm,
            )
            cov = cov_pos.at[2, 2].set(var_th)
            return CorrelativeResult(
                pose=mean_f, response=best_f, covariance=cov
            )
        return CorrelativeResult(pose=mean, response=best, covariance=cov_pos)

    angles_tree = (
        (coarse_a, coarse_m),
        expansions,
        (fine_a, fine_m),
    )
    angles_shardings = jax.tree.map(lambda _: ang, angles_tree)
    jitted = jax.jit(
        body,
        in_shardings=(rep, rep, rep, rep, rep, angles_shardings),
        out_shardings=CorrelativeResult(pose=rep, response=rep, covariance=rep),
    )
    angles_dev = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), ang), angles_tree
    )

    def fn(center_pose, local_pts, valid, base_pts, base_valid):
        return jitted(
            center_pose, local_pts, valid, base_pts, base_valid, angles_dev
        )

    return fn
