"""float64 fidelity mode: core math and the solver run in double precision
on CPU (SURVEY §7 hard part (e): keep a float64 mode for parity studies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_se2_and_solver_float64(x64):
    from tpuslam.core import se2
    from tpuslam.graph.solver import empty_graph, optimize, residuals

    a = jnp.array([1.0, 2.0, 0.7], dtype=jnp.float64)
    b = jnp.array([-0.5, 0.3, -2.9], dtype=jnp.float64)
    out = se2.compose(a, se2.compose(se2.inverse(a), b))
    assert out.dtype == jnp.float64
    assert np.allclose(np.asarray(out), np.asarray(b), atol=1e-12)

    g = empty_graph(8, 8, dtype=jnp.float64)
    poses = jnp.asarray(
        [[0, 0, 0], [1.05, 0.02, 0.01], [2.0, -0.02, 0.0]], jnp.float64
    )
    g = g._replace(
        poses=g.poses.at[:3].set(poses),
        node_mask=g.node_mask.at[:3].set(True),
        edge_i=g.edge_i.at[:2].set(jnp.asarray([0, 1], jnp.int32)),
        edge_j=g.edge_j.at[:2].set(jnp.asarray([1, 2], jnp.int32)),
        measurements=g.measurements.at[:2].set(
            jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]], jnp.float64)
        ),
        precisions=g.precisions.at[:2].set(
            jnp.tile(jnp.eye(3, dtype=jnp.float64) * 10, (2, 1, 1))
        ),
        edge_mask=g.edge_mask.at[:2].set(True),
    )
    r = residuals(g, g.poses)
    assert r.dtype == jnp.float64
    opt, stats = optimize(g, num_iters=10)
    assert opt.dtype == jnp.float64
    assert float(stats.final_cost) < float(stats.initial_cost)
    got = np.asarray(opt)[:3]
    assert np.allclose(got[:, 0], [0, 1, 2], atol=1e-6)


def test_plicp_float64(x64):
    """PL-ICP runs end-to-end in float64 (the oracle cross-check dtype):
    the early-exit while_loop carry must be dtype-stable (regression: the
    stats slots were pinned f32 while the body returned src.dtype)."""
    from tpuslam.core.config import PlicpConfig
    from tpuslam.match.plicp import plicp

    th = np.linspace(0, 2 * np.pi, 180, endpoint=False)
    wall = np.stack([2.0 * np.cos(th), 1.5 * np.sin(th)], -1)
    ref = jnp.asarray(wall, jnp.float64)
    dx = np.array([0.03, -0.02, 0.04])
    c, s = np.cos(dx[2]), np.sin(dx[2])
    src = jnp.asarray((wall - dx[:2]) @ np.array([[c, -s], [s, c]]), jnp.float64)
    v = jnp.ones(180, bool)
    cfg = PlicpConfig(num_beams=180, do_compute_covariance=1)
    res = plicp(cfg, src, v, ref, v)
    assert res.pose.dtype == jnp.float64
    assert bool(res.valid)
    assert res.covariance.dtype == jnp.float64
