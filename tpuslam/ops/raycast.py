"""Fixed-budget Bresenham raycasting over static grids.

The reference traces each beam from the sensor cell to the endpoint cell with
classic integer Bresenham (gmapping:
lesson4/include/lesson4/gmapping/grid/gridlinetraversal.h:27-207; hector:
OccGridMapBase.h:220-299 ``updateLineBresenhami``/``bresenham2D``; karto:
Karto.h:5852-5925 ``RayTrace``).  Those loops have data-dependent lengths —
hostile to XLA.  Here each ray gets a **static step budget** ``max_steps``
and the k-th Bresenham cell is produced in closed form:

    along the major axis  m_k = m0 + sign_m * k
    minor axis            n_k = n0 + sign_n * floor(k * a_minor / a_major + 1/2)

which reproduces integer-midpoint Bresenham (error accumulator
``fraction += 2*dy; if fraction >= 0 ...`` picks exactly
``round(k * dy/dx)``) for all slope cases.  Cells beyond the ray's true
length are masked out, as are rays longer than the budget (tail truncated —
callers size ``max_steps`` >= max_range/resolution so this never bites in
practice).  The endpoint cell is NOT included (matching the reference, which
traces free cells exclusive of the endpoint and marks the endpoint
separately).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def ray_cells(
    start_m: Array,
    end_m: Array,
    max_steps: int,
    drop_start: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Bresenham cells from cell(start) toward cell(end), endpoint excluded.

    start_m, end_m: [..., 2] continuous map coordinates (x, y).
    Returns (ix, iy, mask) each [..., max_steps]; mask[k] is True for cells
    strictly before the endpoint cell.

    Continuous coords snap to the NEAREST lattice point (hector rounds with
    ``(mapf + 0.5).cast<int>()``, OccGridMapBase.h:126-139), consistent with
    cell values being anchored at integer lattice points for bilinear
    interpolation — floor here would bias every wall by half a cell.
    """
    x0 = jnp.floor(start_m[..., 0] + 0.5).astype(jnp.int32)
    y0 = jnp.floor(start_m[..., 1] + 0.5).astype(jnp.int32)
    x1 = jnp.floor(end_m[..., 0] + 0.5).astype(jnp.int32)
    y1 = jnp.floor(end_m[..., 1] + 0.5).astype(jnp.int32)

    dx = x1 - x0
    dy = y1 - y0
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)
    sx = jnp.sign(dx).astype(jnp.int32)
    sy = jnp.sign(dy).astype(jnp.int32)

    amaj = jnp.maximum(adx, ady)
    amin = jnp.minimum(adx, ady)
    x_major = adx >= ady

    k = jnp.arange(max_steps, dtype=jnp.int32)
    k = jnp.broadcast_to(k, x0.shape + (max_steps,))

    # minor_k = floor((2k*amin + amaj) / (2*amaj)) == round-half-up(k*amin/amaj)
    amaj_safe = jnp.maximum(amaj, 1)[..., None]
    minor_step = (2 * k * amin[..., None] + amaj[..., None]) // (2 * amaj_safe)

    maj_k = k
    ix = jnp.where(
        x_major[..., None],
        x0[..., None] + sx[..., None] * maj_k,
        x0[..., None] + sx[..., None] * minor_step,
    )
    iy = jnp.where(
        x_major[..., None],
        y0[..., None] + sy[..., None] * minor_step,
        y0[..., None] + sy[..., None] * maj_k,
    )
    # k ranges over [0, amaj): endpoint cell (k == amaj) excluded — or,
    # where drop_start is True, over (0, amaj]: the walk START excluded
    # and the walk end kept (used by canonical-direction callers whose
    # excluded beam endpoint is the walk's first cell; gmapping's
    # gridLineCore enumerates from the min-major-coordinate end,
    # gridlinetraversal.h:27-180)
    if drop_start is None:
        mask = k < amaj[..., None]
    else:
        ds = drop_start[..., None].astype(jnp.int32)
        mask = (k >= ds) & (k <= amaj[..., None] - 1 + ds)
    return ix, iy, mask
