"""MXU one-hot-matmul bilinear sampler must match the gather formulation."""

import jax.numpy as jnp
import numpy as np

from tpuslam.ops.bilinear import interp_value_grad
from tpuslam.ops.mxu_interp import crop_grid, interp_value_grad_mxu


def test_matches_gather_formulation():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.uniform(0, 1, (64, 96)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-5, 100, (200, 2)), jnp.float32)  # incl. OOB
    v1, g1, inb1 = interp_value_grad(g, pts)
    v2, g2, inb2 = interp_value_grad_mxu(g, pts)
    assert (np.asarray(inb1) == np.asarray(inb2)).all()
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_valid_mask():
    g = jnp.ones((16, 16))
    pts = jnp.asarray([[4.5, 4.5], [5.5, 5.5]], jnp.float32)
    v, gr, inb = interp_value_grad_mxu(g, pts, valid=jnp.asarray([True, False]))
    assert np.asarray(inb).tolist() == [True, False]
    assert np.asarray(v)[1] == 0.0


def test_crop_grid_origin():
    g = jnp.arange(32 * 32, dtype=jnp.float32).reshape(32, 32)
    crop, origin = crop_grid(g, jnp.asarray([20.0, 10.0]), 8)
    ox, oy = int(origin[0]), int(origin[1])
    assert (ox, oy) == (16, 6)
    assert np.allclose(np.asarray(crop), np.asarray(g)[6:14, 16:24])
    # clamped at edges
    crop2, origin2 = crop_grid(g, jnp.asarray([0.0, 31.0]), 8)
    assert int(origin2[0]) == 0 and int(origin2[1]) == 24


def test_crop_plus_mxu_equals_full_gather():
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.uniform(0, 1, (256, 256)), jnp.float32)
    center = jnp.asarray([100.0, 130.0], jnp.float32)
    pts = jnp.asarray(
        center + rng.uniform(-20, 20, (64, 2)).astype(np.float32)
    )
    crop, origin = crop_grid(g, center, 64)
    v2, g2, _ = interp_value_grad_mxu(crop, pts - origin)
    v1, g1, _ = interp_value_grad(g, pts)
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
