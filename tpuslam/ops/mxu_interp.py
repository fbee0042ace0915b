"""MXU-native bilinear value+gradient sampling via fractional one-hot matmuls.

The gather formulation of hector's bilinear interpolation
(ops/bilinear.py, reference OccGridMapUtil.h:139-228) is random-access bound:
XLA lowers 4-neighbor gathers to ~0.13 elements/cycle on TPU.  This module
reformulates the exact same math as dense matmuls on the MXU:

    M(p)   = Y(p)^T  G  X(p)
    dM/dx  = Y(p)^T  G  dX(p)
    dM/dy  = dY(p)^T G  X(p)

where ``X(p) = (1-fx)·e_ix + fx·e_{ix+1}`` and ``dX(p) = e_{ix+1} - e_ix``
are *fractional one-hot* vectors over the columns of a pose-centered crop of
the grid (likewise Y over rows).  For a beam batch this is three
``[B, Wc] @ [Wc, Wc]``-shaped contractions — pure MXU work at ~full FLOP
rate instead of scalar gathers.

The crop window is static per config: ``window >= 2*max_range/resolution``
so every gated beam lands inside it (same zero-outside behavior as the
reference's pointOutOfMapBounds check).  Identical numerics to
ops/bilinear.interp_value_grad for in-window points (verified in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def crop_grid(prob_grid: Array, center_mxy: Array, window: int):
    """Clamped dynamic-slice crop of [window, window] around a map coord.

    Returns (crop, origin_xy) with origin in map-cell coordinates."""
    h, w = prob_grid.shape
    cx = jnp.clip(
        jnp.floor(center_mxy[0]).astype(jnp.int32) - window // 2, 0, max(w - window, 0)
    )
    cy = jnp.clip(
        jnp.floor(center_mxy[1]).astype(jnp.int32) - window // 2, 0, max(h - window, 0)
    )
    crop = jax.lax.dynamic_slice(prob_grid, (cy, cx), (min(window, h), min(window, w)))
    return crop, jnp.stack([cx, cy]).astype(prob_grid.dtype)


def interp_value_grad_mxu(
    crop: Array,
    mpts_rel: Array,
    valid: Array | None = None,
    *,
    compute_dtype=jnp.float32,
) -> tuple[Array, Array, Array]:
    """Bilinear value + gradient over a cropped grid, MXU formulation.

    crop:      [Hc, Wc] probabilities (crop of the map).
    mpts_rel:  [B, 2] continuous map coords RELATIVE to the crop origin.
    Matches ops/bilinear.interp_value_grad semantics: out-of-window points
    return value 0 and gradient 0.

    compute_dtype=bfloat16 runs the contractions at 2x MXU rate.  The
    x-direction lerp applies in f32 AFTER the contraction (xv stays f32);
    the y-direction weights fold into the bf16 row vectors, quantizing fy
    to bf16 — a sub-cell position error <= 2^-9 of a cell (0.1 mm at 5 cm
    resolution), below the matcher's convergence epsilons."""
    hc, wc = crop.shape
    x = mpts_rel[..., 0]
    y = mpts_rel[..., 1]
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = (x - ix)[:, None]
    fy = (y - iy)[:, None]

    inb = (ix >= 0) & (ix + 1 < wc) & (iy >= 0) & (iy + 1 < hc)
    if valid is not None:
        inb = inb & valid
    gate = inb[:, None].astype(crop.dtype)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wc), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, hc), 1)
    ex0 = (ix[:, None] == cols).astype(crop.dtype)
    ex1 = (ix[:, None] + 1 == cols).astype(crop.dtype)
    ey0 = (iy[:, None] == rows).astype(crop.dtype)
    ey1 = (iy[:, None] + 1 == rows).astype(crop.dtype)

    xv = ((1.0 - fx) * ex0 + fx * ex1) * gate  # [B, Wc]
    dxv = (ex1 - ex0) * gate
    yv = ((1.0 - fy) * ey0 + fy * ey1) * gate  # [B, Hc]
    dyv = (ey1 - ey0) * gate

    cd = compute_dtype
    # TPU's DEFAULT matmul precision is one bf16 pass — explicitly request
    # full f32 when asked for it (otherwise the sampler would silently lose
    # ~3e-3 of probability resolution vs the gather formulation)
    prec = (
        jax.lax.Precision.HIGHEST
        if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    yg = jnp.dot(
        yv.astype(cd),
        crop.astype(cd),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [B, Wc]
    dyg = jnp.dot(
        dyv.astype(cd),
        crop.astype(cd),
        preferred_element_type=jnp.float32,
        precision=prec,
    )

    xv = xv.astype(jnp.float32)
    val = jnp.sum(yg * xv, axis=-1)
    gx = jnp.sum(yg * dxv.astype(jnp.float32), axis=-1)
    gy = jnp.sum(dyg * xv, axis=-1)
    return val, jnp.stack([gx, gy], axis=-1), inb
