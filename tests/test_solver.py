"""Pose-graph LM+PCG solver: residual model, Jacobians, convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core import se2
from tpuslam.graph.solver import (
    PoseGraph,
    _build_system,
    _edge_jacobians,
    cost,
    empty_graph,
    optimize,
    residuals,
)


def make_graph(poses, edges, max_nodes=None, max_edges=None):
    """edges: list of (i, j, measurement [3], precision [3,3])."""
    n = len(poses)
    e = len(edges)
    mn = max_nodes or n
    me = max_edges or e
    g = empty_graph(mn, me)
    g = g._replace(
        poses=g.poses.at[:n].set(jnp.asarray(poses, jnp.float32)),
        node_mask=g.node_mask.at[:n].set(True),
        edge_i=g.edge_i.at[:e].set(jnp.asarray([x[0] for x in edges])),
        edge_j=g.edge_j.at[:e].set(jnp.asarray([x[1] for x in edges])),
        measurements=g.measurements.at[:e].set(
            jnp.asarray([x[2] for x in edges], jnp.float32)
        ),
        precisions=g.precisions.at[:e].set(
            jnp.asarray([x[3] for x in edges], jnp.float32)
        ),
        edge_mask=g.edge_mask.at[:e].set(True),
    )
    return g


def rel_measurement(pa, pb):
    return np.asarray(
        se2.relative(jnp.asarray(pa, jnp.float32), jnp.asarray(pb, jnp.float32))
    )


def test_residual_zero_at_truth():
    poses = [[0, 0, 0], [1, 0, 0.5], [1.5, 1.0, -0.3]]
    edges = [
        (0, 1, rel_measurement(poses[0], poses[1]), np.eye(3)),
        (1, 2, rel_measurement(poses[1], poses[2]), np.eye(3)),
    ]
    g = make_graph(poses, edges)
    r = np.asarray(residuals(g, g.poses))
    assert np.allclose(r, 0.0, atol=1e-6)
    assert float(cost(g, g.poses)) < 1e-10


def test_jacobians_match_autodiff():
    rng = np.random.default_rng(0)
    poses = rng.uniform(-2, 2, (4, 3)).astype(np.float32)
    edges = [
        (0, 1, rng.uniform(-1, 1, 3), np.eye(3)),
        (2, 3, rng.uniform(-1, 1, 3), np.eye(3)),
        (1, 2, rng.uniform(-1, 1, 3), np.eye(3)),
    ]
    g = make_graph(poses, edges)
    j0, j1 = _edge_jacobians(g, g.poses)

    def res_fn(p):
        return residuals(g, p)

    jac = jax.jacobian(res_fn)(g.poses)  # [E, 3, N, 3]
    for e, (i, j, _, _) in enumerate(edges):
        assert np.allclose(np.asarray(jac)[e, :, i, :], np.asarray(j0)[e], atol=1e-4)
        assert np.allclose(np.asarray(jac)[e, :, j, :], np.asarray(j1)[e], atol=1e-4)


def test_optimizes_noisy_circle_with_loop_closure():
    rng = np.random.default_rng(1)
    n = 24
    true = np.zeros((n, 3))
    for i in range(1, n):
        th = 2 * np.pi * i / n
        true[i] = [np.cos(th) - 1.0, np.sin(th), se_wrap(th + np.pi / 2)]
    true[0, 2] = np.pi / 2

    # odometry edges with noise-corrupted initial guesses
    prec = np.diag([100.0, 100.0, 400.0])
    edges = []
    noisy = np.zeros_like(true)
    noisy[0] = true[0]
    for i in range(1, n):
        meas = rel_measurement(true[i - 1], true[i])
        edges.append((i - 1, i, meas, prec))
        # integrate noisy odometry for the initial guess
        noise = rng.normal(0, [0.03, 0.03, 0.02])
        step = meas + noise
        noisy[i] = np.asarray(
            se2.compose(jnp.asarray(noisy[i - 1], jnp.float32),
                        jnp.asarray(step, jnp.float32))
        )
    # loop closure: last-to-first exact
    edges.append((n - 1, 0, rel_measurement(true[n - 1], true[0]), prec))

    g = make_graph(noisy, edges, max_nodes=32, max_edges=40)
    poses, stats = optimize(g, num_iters=40, cg_iters=60)
    poses = np.asarray(poses)[:n]

    err_before = np.sqrt(((noisy[:, :2] - true[:, :2]) ** 2).sum(1)).mean()
    err_after = np.sqrt(((poses[:, :2] - true[:, :2]) ** 2).sum(1)).mean()
    assert float(stats.final_cost) < float(stats.initial_cost) / 10.0
    assert err_after < err_before / 2.0, (err_before, err_after)
    # gauge: node 0 untouched
    assert np.allclose(poses[0], noisy[0], atol=1e-6)
    assert int(stats.good_iters) >= 1


def se_wrap(a):
    return float(np.arctan2(np.sin(a), np.cos(a)))


def test_padding_invariance():
    poses = [[0, 0, 0], [1, 0, 0], [2, 0, 0]]
    prec = np.eye(3) * 10
    edges = [
        (0, 1, [1.1, 0.05, 0.02], prec),
        (1, 2, [0.9, -0.05, -0.02], prec),
        (0, 2, [2.0, 0.0, 0.0], prec),
    ]
    tight = make_graph(poses, edges)
    padded = make_graph(poses, edges, max_nodes=16, max_edges=32)
    p1, s1 = optimize(tight, num_iters=15)
    p2, s2 = optimize(padded, num_iters=15)
    assert np.allclose(np.asarray(p1), np.asarray(p2)[:3], atol=1e-5)
    assert np.isclose(float(s1.final_cost), float(s2.final_cost), atol=1e-6)


def test_diag_blocks_match_dense_hessian():
    rng = np.random.default_rng(2)
    poses = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    prec = np.diag([3.0, 2.0, 1.0])
    edges = [
        (0, 1, rng.uniform(-1, 1, 3), prec),
        (1, 2, rng.uniform(-1, 1, 3), prec),
    ]
    g = make_graph(poses, edges)
    sys = _build_system(g, g.poses, n_fixed=0)

    def half_cost_grad(p):
        e = residuals(g, p)
        return 0.5 * jnp.sum(jnp.einsum("ei,eij,ej->e", e, g.precisions, e))

    # Gauss-Newton H approximates the true Hessian; compare gradient exactly
    grad = np.asarray(jax.grad(half_cost_grad)(g.poses))
    assert np.allclose(np.asarray(sys.g), grad, atol=1e-4)
