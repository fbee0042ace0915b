"""Pose-graph solver backends: the reference's pluggable ScanSolver seam.

The reference ships four interchangeable backends behind ``karto::ScanSolver``
(lesson6/lib/open_karto/include/open_karto/Mapper.h:825-891): SPA2d
(lesson6/src/spa_solver/), Ceres (ceres_solver/), g2o (g2o_solver/), and
GTSAM (gtsam_solver/), selected by the ``solver_type`` ROS param
(karto_slam.cc:254-284).  All four minimize the same residual; they differ
only in iteration strategy and stopping rules.  On TPU one engine
(graph/solver.py: matrix-free LM + block-Jacobi PCG) serves them all; this
module keeps the plugin seam and maps each reference backend name to the
equivalent solver configuration:

- ``spa_solver``:   LM, 40 iterations (spa_solver.cc:43-61 doSPA(40)),
- ``ceres_solver``: Gauss-Newton flavor — LM with tiny initial lambda, 50
  max iterations (ceres_solver.cc:131-196 SPARSE_NORMAL_CHOLESKY defaults),
- ``g2o_solver``:   GN, 40 iterations (g2o_solver.cc:42-138 optimize(40)),
- ``gtsam_solver``: LM, up to 500 iterations (gtsam_solver.cc:30-99;
  relativeErrorTol=1e-5).  NOTE: the reference GTSAM adapter feeds the
  COVARIANCE where a noise model expects it and never anchors a prior — a
  quirk we consciously fix (we anchor node 0 and use precisions), as flagged
  in SURVEY.md §2.2.

Custom backends register with :func:`register_solver`.
"""

from __future__ import annotations

from typing import Callable, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.graph.solver import PoseGraph, SolveStats, empty_graph, optimize

Array = jax.Array


class ScanSolver(Protocol):
    """The reference's ScanSolver surface (Mapper.h:825-891), array-native."""

    def compute(self, graph: PoseGraph) -> tuple[Array, SolveStats]:
        """Optimize and return (corrected poses, stats)."""
        ...


class LmSolver:
    """Configurable LM/GN solver over the shared TPU engine."""

    def __init__(
        self,
        num_iters: int = 40,
        cg_iters: int = 60,
        init_lambda: float = 1e-4,
        n_fixed: int = 1,
        gauss_newton: bool = False,
    ):
        self.num_iters = num_iters
        self.cg_iters = cg_iters
        self.init_lambda = init_lambda
        self.n_fixed = n_fixed
        self.gauss_newton = gauss_newton

    def compute(self, graph: PoseGraph) -> tuple[Array, SolveStats]:
        return optimize(
            graph,
            num_iters=self.num_iters,
            cg_iters=self.cg_iters,
            init_lambda=self.init_lambda,
            n_fixed=self.n_fixed,
            gauss_newton=self.gauss_newton,
        )


_REGISTRY: dict[str, Callable[[], ScanSolver]] = {
    "spa_solver": lambda: LmSolver(num_iters=40),
    # iteration caps follow each reference adapter: ceres
    # max_num_iterations=100 (ceres_solver.cc:188), g2o optimize(40)
    # (g2o_solver.cc:112), gtsam maxIterations=500 (gtsam_solver.cc:82)
    "ceres_solver": lambda: LmSolver(num_iters=100, init_lambda=1e-8),
    # TRUE Gauss-Newton semantics: unconditional steps, no damping — the
    # reference's g2o adapter runs OptimizationAlgorithmGaussNewton
    # (g2o_solver.cc:112), which diverges where LM recovers; pinned as a
    # behavior in test_backends.py
    "g2o_solver": lambda: LmSolver(
        num_iters=40, init_lambda=0.0, gauss_newton=True
    ),
    "gtsam_solver": lambda: LmSolver(num_iters=500, init_lambda=1e-5),
}


def register_solver(name: str, factory: Callable[[], ScanSolver]) -> None:
    _REGISTRY[name] = factory


def make_solver(name: str) -> ScanSolver:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown solver_type {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]()


def graph_from_edges(
    poses: np.ndarray,
    edges: list[tuple[int, int, np.ndarray, np.ndarray]],
    min_nodes: int = 256,
    min_edges: int = 512,
) -> PoseGraph:
    """Build a padded PoseGraph from host-side pose/edge lists.

    Capacities are powers of two with generous minimums so the solver
    compiles once for a whole mapping session instead of at every
    capacity bump (each XLA compile costs tens of seconds on TPU; the
    padded PCG work is masked and cheap by comparison)."""
    n, e = len(poses), len(edges)
    cap_n = max(min_nodes, 1 << max(4, (max(n, 1) - 1).bit_length()))
    cap_e = max(min_edges, 1 << max(4, (max(e, 1) - 1).bit_length()))
    # build the padded arrays HOST-SIDE: the previous eager
    # ``.at[:n].set`` formulation compiled a fresh device program for
    # every distinct (n, e) slice shape — one remote compile per
    # correct_poses call on tunneled backends; NumPy fill + one
    # device_put per field never compiles
    p = np.zeros((cap_n, 3), np.float32)
    node_mask = np.zeros(cap_n, bool)
    p[:n] = np.asarray(poses[:n], np.float32)
    node_mask[:n] = True
    edge_i = np.zeros(cap_e, np.int32)
    edge_j = np.zeros(cap_e, np.int32)
    meas = np.zeros((cap_e, 3), np.float32)
    prec = np.zeros((cap_e, 3, 3), np.float32)
    edge_mask = np.zeros(cap_e, bool)
    if e:
        edge_i[:e] = [x[0] for x in edges]
        edge_j[:e] = [x[1] for x in edges]
        meas[:e] = np.asarray([x[2] for x in edges], np.float32)
        prec[:e] = np.asarray([x[3] for x in edges], np.float32)
        edge_mask[:e] = True
    return PoseGraph(
        poses=jnp.asarray(p),
        node_mask=jnp.asarray(node_mask),
        edge_i=jnp.asarray(edge_i),
        edge_j=jnp.asarray(edge_j),
        measurements=jnp.asarray(meas),
        precisions=jnp.asarray(prec),
        edge_mask=jnp.asarray(edge_mask),
    )
