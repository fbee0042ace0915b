"""Bilinear map value + gradient interpolation.

The hot gather of Hector-style scan-to-map matching: sample an occupancy
probability and its spatial gradient at a continuous map coordinate
(reference behavior: lesson4/.../map/OccGridMapUtil.h:139-228
``interpMapValueWithDerivatives``).  The reference caches per-cell
probabilities in a side array because its gathers are scalar loops
(OccGridMapUtil.h:162-166 notes the slowdown); on TPU the four lattice
gathers are one vectorized `take` over all beams at once, so no cache is
needed — probabilities are computed on the fly from log-odds.

Out-of-bounds points return value 0 and gradient 0 (reference returns
``Vector3f(0,0,0)`` when ``pointOutOfMapBounds``, OccGridMapUtil.h:141-144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuslam.core.grid import GridSpec

Array = jax.Array


def prob_from_log_odds(log_odds: Array) -> Array:
    """p = exp(l) / (1 + exp(l)) (reference: GridMapLogOdds.h:92-161)."""
    return jax.nn.sigmoid(log_odds)


def interp_value_grad(
    prob_grid: Array, mpts: Array, valid: Array | None = None
) -> tuple[Array, Array, Array]:
    """Bilinear value + gradient at continuous map coords.

    prob_grid: [H, W] occupancy probabilities (grid[iy, ix]).
    mpts:      [..., 2] continuous map coordinates (x, y).
    valid:     [...] optional mask; invalid points behave as out-of-bounds.

    Returns (value [...], grad [..., 2], in_bounds [...]); value/grad are 0
    where out of bounds, matching OccGridMapUtil.h:141-144.  Gradients are in
    map-cell units (the reference also works in map coords throughout).
    """
    h, w = prob_grid.shape
    x = mpts[..., 0]
    y = mpts[..., 1]
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - ix
    fy = y - iy

    inb = (ix >= 0) & (ix + 1 < w) & (iy >= 0) & (iy + 1 < h)
    if valid is not None:
        inb = inb & valid
    ixc = jnp.clip(ix, 0, w - 2)
    iyc = jnp.clip(iy, 0, h - 2)

    flat = prob_grid.reshape(-1)
    base = iyc * w + ixc
    p00 = jnp.take(flat, base)
    p10 = jnp.take(flat, base + 1)
    p01 = jnp.take(flat, base + w)
    p11 = jnp.take(flat, base + w + 1)

    # OccGridMapUtil.h:200-228 lattice blend and gradient rows.
    val = fy * (fx * p11 + (1.0 - fx) * p01) + (1.0 - fy) * (
        fx * p10 + (1.0 - fx) * p00
    )
    gx = fy * (p11 - p01) + (1.0 - fy) * (p10 - p00)
    gy = fx * (p11 - p10) + (1.0 - fx) * (p01 - p00)

    zero = jnp.zeros_like(val)
    val = jnp.where(inb, val, zero)
    gx = jnp.where(inb, gx, zero)
    gy = jnp.where(inb, gy, zero)
    return val, jnp.stack([gx, gy], axis=-1), inb


def interp_value(prob_grid: Array, mpts: Array) -> Array:
    """Value-only bilinear sample (reference: OccGridMapUtil.h:163-198)."""
    val, _, _ = interp_value_grad(prob_grid, mpts)
    return val


def world_interp_value_grad(
    spec: GridSpec, prob_grid: Array, wpts: Array
) -> tuple[Array, Array, Array]:
    """Same, but points in world meters; gradient converted to 1/meter."""
    val, grad, inb = interp_value_grad(prob_grid, spec.world_to_map(wpts))
    return val, grad / spec.resolution, inb
