"""Solver backend registry: all four reference solver_type names work."""

import numpy as np
import pytest

from tpuslam.graph.backends import graph_from_edges, make_solver, register_solver


def small_problem():
    poses = np.array([[0, 0, 0], [1.05, 0.04, 0.02], [2.1, -0.03, -0.01]])
    prec = np.eye(3) * 50
    edges = [
        (0, 1, np.array([1.0, 0.0, 0.0]), prec),
        (1, 2, np.array([1.0, 0.0, 0.0]), prec),
        (0, 2, np.array([2.0, 0.0, 0.0]), prec),
    ]
    return poses, edges


@pytest.mark.parametrize(
    "name", ["spa_solver", "ceres_solver", "g2o_solver", "gtsam_solver"]
)
def test_all_reference_backends(name):
    poses, edges = small_problem()
    g = graph_from_edges(poses, edges)
    solver = make_solver(name)
    out, stats = solver.compute(g)
    out = np.asarray(out)[:3]
    assert float(stats.final_cost) < float(stats.initial_cost)
    # chain should straighten to x = 0, 1, 2
    assert np.allclose(out[:, 0], [0, 1, 2], atol=0.05), out
    assert np.allclose(out[0], poses[0])  # gauge


def test_unknown_backend_raises():
    with pytest.raises(KeyError):
        make_solver("nope")


def test_custom_backend_registration():
    calls = []

    class Dummy:
        def compute(self, graph):
            calls.append(1)
            from tpuslam.graph.solver import SolveStats
            import jax.numpy as jnp

            z = jnp.zeros(())
            return graph.poses, SolveStats(z, z, jnp.zeros((), jnp.int32), z)

    register_solver("dummy", Dummy)
    s = make_solver("dummy")
    poses, edges = small_problem()
    g = graph_from_edges(poses, edges)
    s.compute(g)
    assert calls == [1]


def test_graph_from_edges_padding():
    poses, edges = small_problem()
    g = graph_from_edges(poses, edges)
    assert g.poses.shape[0] >= 3 and g.edge_i.shape[0] >= 3
    assert int(g.node_mask.sum()) == 3
    assert int(g.edge_mask.sum()) == 3
    # empty graph path
    g0 = graph_from_edges(np.zeros((0, 3)), [])
    assert int(g0.node_mask.sum()) == 0
