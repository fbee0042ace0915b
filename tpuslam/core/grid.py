"""Static grid geometry: world ↔ map affine transforms.

The reference's hector maps carry ``mapTworld = scale(1/cellLength) ·
translate(offset)`` and its inverse (reference:
lesson4/.../map/GridMapBase.h:270-286); poses transform by scaling x,y only
(GridMapBase.h:229-242).  Here the geometry is a static frozen dataclass so
it constant-folds under jit, and the cells themselves live in plain arrays
owned by the mapping modules (ops/logodds.py, models/gmapping.py, ...).

Convention: continuous *map coordinates* m = (w - origin) / resolution, where
``w`` is a world point and ``origin`` the world position of map coordinate
(0, 0).  Cell (ix, iy) stores the value anchored at integer map coordinate
(ix, iy) — bilinear interpolation between integer lattice points, exactly the
reference's interpMapValueWithDerivatives lattice (OccGridMapUtil.h:139-228).
Arrays are indexed ``grid[iy, ix]`` (row = y) for XLA-friendly 2D layouts.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static grid geometry (hashable; safe as a jit static argument)."""

    resolution: float  # meters per cell (reference default 0.05, hector_slam.cc:138)
    size_x: int  # cells along x (columns)
    size_y: int  # cells along y (rows)
    origin_x: float  # world x of map coord (0, 0)
    origin_y: float  # world y of map coord (0, 0)

    @classmethod
    def centered(
        cls,
        resolution: float,
        size: int,
        start_frac: float = 0.5,
        start_frac_y: float | None = None,
    ) -> "GridSpec":
        """Square map with the world origin at ``start_frac`` of the map —
        hector's mapStart coords (hector_slam.cc:143-145, defaults 0.5);
        ``start_frac_y`` sets the y fraction independently (defaults to
        ``start_frac``)."""
        extent = size * resolution
        fy = start_frac if start_frac_y is None else start_frac_y
        return cls(
            resolution, size, size, -extent * start_frac, -extent * fy
        )

    @property
    def shape(self) -> tuple[int, int]:
        return (self.size_y, self.size_x)

    def coarsen(self, factor: int = 2) -> "GridSpec":
        """The next pyramid level: resolution × factor, size / factor, same
        world extent (reference: MapRepMultiMap.h:57-90)."""
        return GridSpec(
            self.resolution * factor,
            self.size_x // factor,
            self.size_y // factor,
            self.origin_x,
            self.origin_y,
        )

    # --- point transforms -------------------------------------------------
    def world_to_map(self, pts: Array) -> Array:
        """World points [..., 2] → continuous map coords [..., 2]."""
        origin = jnp.array([self.origin_x, self.origin_y], dtype=pts.dtype)
        return (pts - origin) / self.resolution

    def map_to_world(self, mpts: Array) -> Array:
        origin = jnp.array([self.origin_x, self.origin_y], dtype=mpts.dtype)
        return mpts * self.resolution + origin

    # --- pose transforms (scale x,y, keep theta: GridMapBase.h:229-242) ---
    def world_pose_to_map(self, pose: Array) -> Array:
        xy = self.world_to_map(pose[..., :2])
        return jnp.concatenate([xy, pose[..., 2:3]], axis=-1)

    def map_pose_to_world(self, pose: Array) -> Array:
        xy = self.map_to_world(pose[..., :2])
        return jnp.concatenate([xy, pose[..., 2:3]], axis=-1)

    # --- index helpers -----------------------------------------------------
    def in_bounds(self, ix: Array, iy: Array, margin: int = 0) -> Array:
        return (
            (ix >= margin)
            & (ix < self.size_x - margin)
            & (iy >= margin)
            & (iy < self.size_y - margin)
        )

    def flat_index(self, ix: Array, iy: Array) -> Array:
        """Row-major flat index with clamping (callers mask separately)."""
        ixc = jnp.clip(ix, 0, self.size_x - 1)
        iyc = jnp.clip(iy, 0, self.size_y - 1)
        return iyc * self.size_x + ixc
