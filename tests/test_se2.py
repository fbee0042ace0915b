import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.core import se2


def rng(seed=0):
    return np.random.default_rng(seed)


def rand_pose(r, shape=()):
    xy = r.uniform(-5, 5, shape + (2,))
    th = r.uniform(-np.pi, np.pi, shape + (1,))
    return jnp.asarray(np.concatenate([xy, th], axis=-1), dtype=jnp.float32)


def test_compose_matches_matrix_product():
    r = rng(1)
    a, b = rand_pose(r, (16,)), rand_pose(r, (16,))
    got = se2.compose(a, b)
    want = se2.from_matrix(se2.to_matrix(a) @ se2.to_matrix(b))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inverse_roundtrip():
    r = rng(2)
    p = rand_pose(r, (8,))
    ident = se2.compose(p, se2.inverse(p))
    np.testing.assert_allclose(ident, np.zeros((8, 3)), atol=1e-5)


def test_relative_recovers_motion():
    r = rng(3)
    a, d = rand_pose(r, (8,)), rand_pose(r, (8,))
    b = se2.compose(a, d)
    np.testing.assert_allclose(se2.relative(a, b), d, atol=1e-5)


def test_transform_points_matches_matrix():
    r = rng(4)
    pose = rand_pose(r)
    pts = jnp.asarray(r.uniform(-3, 3, (32, 2)), dtype=jnp.float32)
    got = se2.transform_points(pose, pts)
    m = np.asarray(se2.to_matrix(pose))
    want = pts @ m[:2, :2].T + m[:2, 2]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_wrap_angle():
    th = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 7.0, -7.0])
    w = se2.wrap_angle(th)
    assert np.all(np.abs(w) <= np.pi + 1e-6)
    np.testing.assert_allclose(np.cos(w), np.cos(th), atol=1e-6)
    np.testing.assert_allclose(np.sin(w), np.sin(th), atol=1e-6)


def test_exp_log_roundtrip():
    r = rng(5)
    tw = jnp.asarray(r.uniform(-1, 1, (16, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(se2.log(se2.exp(tw)), tw, atol=1e-4)
    # small-angle branch
    tw0 = tw.at[:, 2].set(1e-8)
    np.testing.assert_allclose(se2.log(se2.exp(tw0)), tw0, atol=1e-4)


def test_interp_endpoints_and_shortest_arc():
    a = jnp.array([0.0, 0.0, 3.0], dtype=jnp.float32)
    b = jnp.array([1.0, 2.0, -3.0], dtype=jnp.float32)
    np.testing.assert_allclose(se2.interp(a, b, 0.0), a, atol=1e-6)
    np.testing.assert_allclose(se2.interp(a, b, 1.0), b, atol=1e-5)
    mid = se2.interp(a, b, 0.5)
    # shortest arc from 3.0 to -3.0 crosses pi, not zero
    assert abs(abs(float(mid[2])) - np.pi) < 0.15


def test_jit_and_vmap():
    r = rng(6)
    a, b = rand_pose(r, (8,)), rand_pose(r, (8,))
    jitted = jax.jit(se2.compose)
    np.testing.assert_allclose(jitted(a, b), se2.compose(a, b), atol=1e-6)
    vm = jax.vmap(se2.compose)(a, b)
    np.testing.assert_allclose(vm, se2.compose(a, b), atol=1e-6)
