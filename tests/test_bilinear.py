"""Bilinear value+gradient interpolation (hector OccGridMapUtil semantics)."""

import jax.numpy as jnp
import numpy as np

from tpuslam.ops.bilinear import interp_value_grad, prob_from_log_odds


def test_exact_on_lattice():
    g = jnp.arange(16.0).reshape(4, 4)
    pts = jnp.array([[1.0, 2.0], [2.0, 1.0]])
    val, _, inb = interp_value_grad(g, pts)
    assert np.allclose(np.asarray(val), [9.0, 6.0])  # grid[iy, ix]
    assert np.asarray(inb).all()


def test_linear_plane_gradient():
    # grid value = 2*ix + 3*iy  → gradient (2, 3) everywhere inside
    iy, ix = np.mgrid[0:8, 0:8]
    g = jnp.asarray(2.0 * ix + 3.0 * iy)
    pts = jnp.array([[2.3, 4.7], [5.1, 1.9]])
    val, grad, _ = interp_value_grad(g, pts)
    want = 2.0 * np.array([2.3, 5.1]) + 3.0 * np.array([4.7, 1.9])
    assert np.allclose(np.asarray(val), want, atol=1e-5)
    assert np.allclose(np.asarray(grad), [[2, 3], [2, 3]], atol=1e-5)


def test_out_of_bounds_zero():
    g = jnp.ones((4, 4))
    pts = jnp.array([[-1.0, 2.0], [3.5, 3.5], [2.0, 2.0]])
    val, grad, inb = interp_value_grad(g, pts)
    # (3.5, 3.5) needs lattice cell (3,3)+(4,4) → out of bounds (w-1)
    assert np.asarray(inb).tolist() == [False, False, True]
    assert np.allclose(np.asarray(val), [0.0, 0.0, 1.0])
    assert np.allclose(np.asarray(grad)[:2], 0.0)


def test_valid_mask_zeroes():
    g = jnp.ones((4, 4))
    pts = jnp.array([[1.5, 1.5]])
    val, _, inb = interp_value_grad(g, pts, valid=jnp.array([False]))
    assert not np.asarray(inb)[0] and np.asarray(val)[0] == 0.0


def test_prob_from_log_odds():
    lo = jnp.array([0.0, 100.0, -100.0])
    p = np.asarray(prob_from_log_odds(lo))
    assert np.allclose(p, [0.5, 1.0, 0.0], atol=1e-6)
