"""Pallas TPU kernel: full Hector GN level match with a VMEM-resident crop.

The XLA fast path (ops/mxu_interp.py) re-reads the pose-centered crop from
HBM on every GN iteration and for every neighbor matmul — at batch 1024 and
window 640 that is ~18 GB of redundant HBM traffic per matched batch.  This
kernel runs ONE scan per grid program, DMAs its crop into VMEM once, and
keeps all ``num_iters`` Gauss-Newton iterations on-chip:

  per iteration (all in VMEM):
    transform points by the current pose estimate        (VPU)
    build fractional one-hot row/col weight matrices      (VPU)
    Y @ C and dY @ C contractions                         (MXU)
    reduce to the 3x3 normal system, solve by adjugate,   (VPU/scalar)
    clamp the yaw step and update the pose

Numerics match match/hector.gn_system_mxu with compute_dtype=bfloat16 for
in-window points (see tests/test_pallas_hector.py).  Semantics contract:
reference ScanMatcher.h:60-139 / OccGridMapUtil.h:77-132 via SURVEY §2.2.

Measured on one v5e chip (batch 1024, window 640, 512 beams, 5 GN iters):
the kernel runs the finest level ~11% faster than the XLA MXU path (28.7k
vs 25.7k level-matches/s), but over the FULL 3-level pyramid XLA's
cross-level fusion still wins (20.1k vs 17.1k), so ``matcher_impl="mxu"``
remains the default; ``match_pyramid_batched(..., impl="pallas")`` selects
the hybrid kernel path explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(
    pts_ref,  # [T, B, 2] f32 VMEM — this block's points (map-cell units)
    valid_ref,  # [T, B, 1] f32 VMEM — 1.0 valid
    pose_ref,  # [T, 3, 1] f32 VMEM — initial poses (map coords)
    grid_ref,  # [H, W] bf16 HBM — full probability grid
    out_pose_ref,  # [T, 3, 1] f32
    out_h_ref,  # [T, 3, 3] f32
    out_score_ref,  # [T, 1, 1] f32
    crop_raw_ref,  # [window, window] bf16 VMEM scratch (DMA target)
    crop_ref,  # [window, 2*window] bf16 VMEM scratch: [C | rowdiff(C)]
    sem,  # DMA semaphore
    *,
    window: int,
    num_iters: int,
    yaw_clamp: float,
    grid_h: int,
    grid_w: int,
    tile: int,
):
    def body(t, _):
        _one_scan(
            pts_ref, valid_ref, pose_ref, grid_ref, out_pose_ref, out_h_ref,
            out_score_ref, crop_raw_ref, crop_ref, sem, t,
            window=window, num_iters=num_iters, yaw_clamp=yaw_clamp,
            grid_h=grid_h, grid_w=grid_w,
        )
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def _one_scan(
    pts_ref, valid_ref, pose_ref, grid_ref, out_pose_ref, out_h_ref,
    out_score_ref, crop_raw_ref, crop_ref, sem, t,
    *, window, num_iters, yaw_clamp, grid_h, grid_w,
):
    # keep every beam-indexed tensor 2-D ([B, 1] columns) — Mosaic's layout
    # inference chokes on mixed 1-D/2-D chains
    px = pts_ref[pl.ds(t, 1), :, 0:1][0]
    py = pts_ref[pl.ds(t, 1), :, 1:2][0]
    vmask = valid_ref[pl.ds(t, 1), :, 0:1][0]
    b = px.shape[0]

    pose0 = pose_ref[pl.ds(t, 1), :, 0][0]
    # crop origin from the INITIAL pose, aligned DOWN to the bf16 VMEM tile
    # (8, 128) — dynamic DMA slices of tiled memrefs must start on tile
    # boundaries; the caller adds matching slack to the window so points
    # never fall outside the aligned crop
    ox = jnp.clip(
        jnp.floor(pose0[0]).astype(jnp.int32) - window // 2,
        0,
        max(grid_w - window, 0),
    )
    oy = jnp.clip(
        jnp.floor(pose0[1]).astype(jnp.int32) - window // 2,
        0,
        max(grid_h - window, 0),
    )
    ox = (ox // 128) * 128
    oy = (oy // 8) * 8
    dma = pltpu.make_async_copy(
        grid_ref.at[pl.ds(oy, window), pl.ds(ox, window)],
        crop_raw_ref,
        sem,
    )
    dma.start()
    dma.wait()
    c0 = crop_raw_ref[:]
    # row-diff with zero last row (points with iy = window-1 are gated out)
    shifted = jnp.concatenate(
        [c0[1:, :], jnp.zeros((1, window), jnp.bfloat16)], axis=0
    )
    crop_ref[:, :window] = c0
    crop_ref[:, window:] = shifted - c0

    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, window), 1)
    colsf = cols.astype(jnp.float32)

    def sample(pose):
        c = jnp.cos(pose[2])
        s = jnp.sin(pose[2])
        tx = c * px - s * py + pose[0] - oxf  # [B, 1]
        ty = s * px + c * py + pose[1] - oyf
        ix = jnp.floor(tx).astype(jnp.int32)
        iy = jnp.floor(ty).astype(jnp.int32)
        fx = tx - ix
        fy = ty - iy
        inb = (
            (ix >= 0)
            & (ix + 1 < window)
            & (iy >= 0)
            & (iy + 1 < window)
            & (vmask > 0.0)
        )  # [B, 1]
        gate = inb.astype(jnp.float32)

        # pure row one-hot + precomputed row-diff crop: P0 = C[iy, :],
        # Dg = C[iy+1, :] - C[iy, :]; the fy-lerp happens in f32 AFTER the
        # matmul (more precise than folding fractions into bf16 one-hots,
        # and only one one-hot family to build on the VPU)
        ey0 = ((iy == cols) & inb).astype(jnp.bfloat16)  # [B, W]
        both = jnp.dot(
            ey0, crop_ref[:], preferred_element_type=jnp.float32
        )  # [B, 2W] -> P0 | Dg
        p0 = both[:, :window]
        dg = both[:, window:]
        yg = p0 + fy * dg  # C at (iy + fy) per column
        dyg = dg

        # column weights as a tent function; dxv by interval membership
        u = colsf - tx  # [B, W]
        xv = jnp.maximum(1.0 - jnp.abs(u), 0.0) * gate
        dxv = (
            ((u > 0.0) & (u <= 1.0)).astype(jnp.float32)
            - ((u > -1.0) & (u <= 0.0)).astype(jnp.float32)
        ) * gate

        val = jnp.sum(yg * xv, axis=-1, keepdims=True)  # [B, 1]
        gx = jnp.sum(yg * dxv, axis=-1, keepdims=True)
        gy = jnp.sum(dyg * xv, axis=-1, keepdims=True)

        rot = (-s * px - c * py) * gx + (c * px - s * py) * gy
        r = jnp.where(inb, 1.0 - val, 0.0)
        # 3x3 normal system via reductions
        h00 = jnp.sum(gx * gx)
        h01 = jnp.sum(gx * gy)
        h02 = jnp.sum(gx * rot)
        h11 = jnp.sum(gy * gy)
        h12 = jnp.sum(gy * rot)
        h22 = jnp.sum(rot * rot)
        d0 = jnp.sum(gx * r)
        d1 = jnp.sum(gy * r)
        d2 = jnp.sum(rot * r)
        score = jnp.sum(jnp.where(inb, val, 0.0))
        return (h00, h01, h02, h11, h12, h22), (d0, d1, d2), score

    def gn_step(_, carry):
        pose, _, _ = carry
        (a, bb, c_, d, e, f), (d0, d1, d2), score = sample(pose)
        det = a * (d * f - e * e) - bb * (bb * f - e * c_) + c_ * (
            bb * e - d * c_
        )
        ok = jnp.abs(det) > 1e-12
        det_safe = jnp.where(ok, det, 1.0)
        i00 = (d * f - e * e) / det_safe
        i01 = (c_ * e - bb * f) / det_safe
        i02 = (bb * e - c_ * d) / det_safe
        i11 = (a * f - c_ * c_) / det_safe
        i12 = (bb * c_ - a * e) / det_safe
        i22 = (a * d - bb * bb) / det_safe
        dx = i00 * d0 + i01 * d1 + i02 * d2
        dy = i01 * d0 + i11 * d1 + i12 * d2
        dth = jnp.clip(
            i02 * d0 + i12 * d1 + i22 * d2, -yaw_clamp, yaw_clamp
        )
        new_pose = jnp.where(
            ok, pose + jnp.stack([dx, dy, dth]), pose
        )
        hmat = jnp.array(
            [[a, bb, c_], [bb, d, e], [c_, e, f]], dtype=jnp.float32
        )
        return new_pose, hmat, score

    pose, hmat, score = jax.lax.fori_loop(
        0,
        num_iters,
        gn_step,
        (pose0, jnp.eye(3, dtype=jnp.float32), jnp.zeros((), jnp.float32)),
    )
    out_pose_ref[pl.ds(t, 1), :, :] = pose.reshape(1, 3, 1)
    out_h_ref[pl.ds(t, 1), :, :] = hmat.reshape(1, 3, 3)
    n = jnp.maximum(jnp.sum(vmask), 1.0)
    out_score_ref[pl.ds(t, 1), :, :] = (score / n).reshape(1, 1, 1)


@functools.partial(
    jax.jit, static_argnames=("window", "num_iters", "yaw_clamp")
)
def match_level_pallas(
    prob_grid: Array,  # [H, W] float32 or bfloat16 probabilities
    pts_map: Array,  # [S, B, 2] scan points in map-cell units
    valid: Array,  # [S, B] bool
    poses_map: Array,  # [S, 3] initial poses (map coords)
    *,
    window: int,
    num_iters: int,
    yaw_clamp: float = 0.2,
) -> tuple[Array, Array, Array]:
    """Batched one-level Hector GN match; returns (poses, H, scores)."""
    s, b, _ = pts_map.shape
    h, w = prob_grid.shape
    window = min(window, min(h, w))
    grid_bf16 = prob_grid.astype(jnp.bfloat16)
    tile = 1  # >1 exceeds the 16 MB VMEM budget at window 640

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            window=window,
            num_iters=num_iters,
            yaw_clamp=yaw_clamp,
            grid_h=h,
            grid_w=w,
            tile=tile,
        ),
        grid=(s // tile,),
        in_specs=[
            pl.BlockSpec((tile, b, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, b, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # grid stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((tile, 3, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, 3, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 3, 3), jnp.float32),
            jax.ShapeDtypeStruct((s, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((window, window), jnp.bfloat16),
            pltpu.VMEM((window, 2 * window), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(
        pts_map.astype(jnp.float32),
        valid.astype(jnp.float32)[..., None],
        poses_map.astype(jnp.float32)[..., None],
        grid_bf16,
    )
    poses, hs, scores = out
    return poses[..., 0], hs, scores[:, 0, 0]
