"""ray_cells must reproduce integer-midpoint Bresenham (endpoint excluded).

Reference semantics: gmapping gridlinetraversal.h:27-207 and hector
OccGridMapBase.h:220-299 trace the same midpoint lines; here we check against
an independent pure-Python Bresenham."""

import jax.numpy as jnp
import numpy as np

from tpuslam.ops.raycast import ray_cells


def bresenham_py(x0, y0, x1, y1):
    """Classic integer midpoint Bresenham, endpoint excluded."""
    cells = []
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    sx = 1 if x1 >= x0 else -1
    sy = 1 if y1 >= y0 else -1
    x, y = x0, y0
    if dx >= dy:
        err = dx // 2
        for _ in range(dx):
            cells.append((x, y))
            err -= dy
            if err < 0:
                y += sy
                err += dx
            x += sx
    else:
        err = dy // 2
        for _ in range(dy):
            cells.append((x, y))
            err -= dx
            if err < 0:
                x += sx
                err += dy
            y += sy
    return cells


def cells_from_kernel(start, end, max_steps=64):
    ix, iy, m = ray_cells(
        jnp.asarray(start, jnp.float32), jnp.asarray(end, jnp.float32), max_steps
    )
    ix, iy, m = np.asarray(ix), np.asarray(iy), np.asarray(m)
    return [(int(a), int(b)) for a, b, k in zip(ix, iy, m) if k]


def test_matches_reference_bresenham_random():
    rng = np.random.default_rng(42)
    for _ in range(200):
        x0, y0, x1, y1 = rng.integers(-20, 20, size=4)
        got = cells_from_kernel(
            [x0 + 0.3, y0 - 0.2], [x1 + 0.1, y1 + 0.4]
        )
        want = bresenham_py(x0, y0, x1, y1)
        assert len(got) == len(want)
        # the major axis walk must be identical; the minor axis may differ by
        # at most the tie-breaking convention on exact half steps
        diffs = [abs(g[0] - w[0]) + abs(g[1] - w[1]) for g, w in zip(got, want)]
        assert max(diffs, default=0) <= 1, (got, want)


def test_axis_aligned_and_degenerate():
    assert cells_from_kernel([0.1, 0.1], [4.2, 0.1]) == [
        (0, 0),
        (1, 0),
        (2, 0),
        (3, 0),
    ]
    assert cells_from_kernel([0.1, 0.1], [0.1, 3.2]) == [(0, 0), (0, 1), (0, 2)]
    # same-cell ray: no free cells
    assert cells_from_kernel([0.2, 0.2], [0.4, 0.4]) == []


def test_diagonal_exact():
    got = cells_from_kernel([0.1, 0.1], [5.2, 5.2])
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]


def test_budget_truncation():
    got = cells_from_kernel([0.1, 0.1], [100.2, 0.1], max_steps=8)
    assert got == [(i, 0) for i in range(8)]


def test_batched_shape():
    start = jnp.zeros((7, 2))
    end = jnp.tile(jnp.array([3.0, 1.0]), (7, 1))
    ix, iy, m = ray_cells(start, end, 16)
    assert ix.shape == (7, 16) and m.shape == (7, 16)
    assert int(m.sum()) == 7 * 3
