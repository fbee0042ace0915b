"""Sparse 2D pose-graph optimizer: Levenberg-Marquardt + block-Jacobi PCG.

The TPU-native replacement for ALL FOUR reference backends (SPA2d / Ceres /
g2o / GTSAM adapters, lesson6/src/*_solver/) — they share one residual model,
reproduced here from the primary backend (reference:
lesson6/lib/sparse_bundle_adjustment/src/spa2d.cpp):

- residual ``e = [R0^T (t1 - t0) - t_mean;  wrap(th1 - th0 - th_mean)]``
  with per-edge 3x3 precision ``prec`` (calcErr, spa2d.cpp:148-159),
- analytic Jacobians ``J0 = [-R0^T, dR0^T/dth (t1-t0); 0, -1]``,
  ``J1 = [R0^T, 0; 0, 1]`` (setJacobians, spa2d.cpp:86-142),
- LM loop: solve ``(H + lambda*D) dx = -g``, accept if cost decreases
  (lambda *= 0.5) else reject and restore (lambda *= laminc, laminc *= 2 —
  the reference's escalating reject factor, spa2d.cpp:555-582),
- convergence when ``|dx|^2 < 1e-16`` (spa2d.cpp:529-537),
- gauge fixed by the first ``n_fixed`` nodes (spa2d.cpp:435-449).

Where the reference assembles an explicit block-sparse H and hands it to
CSparse/CHOLMOD Cholesky or its own block PCG (csparse.cpp, bpcg/bpcg.h:
178-330), the TPU formulation is **matrix-free**: ``H x`` is two gathers +
two 3x3 matvecs + two scatter-adds per edge, and the solver is conjugate
gradients preconditioned with the inverse diagonal blocks — the same
block-Jacobi PCG the reference ships, with no sparse factorization anywhere.
Graphs are fixed-capacity pytrees (padded edges with masks) so the whole
optimize() is one jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuslam.core import se2

Array = jax.Array


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph (padded, mask-gated)."""

    poses: Array  # [N, 3] node estimates (x, y, theta)
    node_mask: Array  # [N] bool — active nodes
    edge_i: Array  # [E] int32 — source node (constraint reference frame)
    edge_j: Array  # [E] int32 — target node
    measurements: Array  # [E, 3] pose of j in i's frame (t_mean, th_mean)
    precisions: Array  # [E, 3, 3] information matrices
    edge_mask: Array  # [E] bool — active edges


def empty_graph(max_nodes: int, max_edges: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        poses=jnp.zeros((max_nodes, 3), dtype),
        node_mask=jnp.zeros((max_nodes,), bool),
        edge_i=jnp.zeros((max_edges,), jnp.int32),
        edge_j=jnp.zeros((max_edges,), jnp.int32),
        measurements=jnp.zeros((max_edges, 3), dtype),
        precisions=jnp.zeros((max_edges, 3, 3), dtype),
        edge_mask=jnp.zeros((max_edges,), bool),
    )


def residuals(graph: PoseGraph, poses: Array) -> Array:
    """[E, 3] constraint errors (spa2d.cpp:148-159), zero on masked edges."""
    pi = jnp.take(poses, graph.edge_i, axis=0)
    pj = jnp.take(poses, graph.edge_j, axis=0)
    c, s = jnp.cos(pi[:, 2]), jnp.sin(pi[:, 2])
    dx = pj[:, 0] - pi[:, 0]
    dy = pj[:, 1] - pi[:, 1]
    ex = c * dx + s * dy - graph.measurements[:, 0]
    ey = -s * dx + c * dy - graph.measurements[:, 1]
    eth = se2.wrap_angle(pj[:, 2] - pi[:, 2] - graph.measurements[:, 2])
    e = jnp.stack([ex, ey, eth], axis=-1)
    return jnp.where(graph.edge_mask[:, None], e, 0.0)


def cost(graph: PoseGraph, poses: Array) -> Array:
    e = residuals(graph, poses)
    return jnp.sum(jnp.einsum("ei,eij,ej->e", e, graph.precisions, e))


def _edge_jacobians(graph: PoseGraph, poses: Array) -> tuple[Array, Array]:
    """J0, J1 per edge [E, 3, 3] (spa2d.cpp:86-142)."""
    pi = jnp.take(poses, graph.edge_i, axis=0)
    pj = jnp.take(poses, graph.edge_j, axis=0)
    c, s = jnp.cos(pi[:, 2]), jnp.sin(pi[:, 2])
    dx = pj[:, 0] - pi[:, 0]
    dy = pj[:, 1] - pi[:, 1]
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    # R0^T rows: [c, s; -s, c]; dR0^T/dth = [-s, c; -c, -s]
    j0 = jnp.stack(
        [
            jnp.stack([-c, -s, -s * dx + c * dy], axis=-1),
            jnp.stack([s, -c, -c * dx - s * dy], axis=-1),
            jnp.stack([zero, zero, -one], axis=-1),
        ],
        axis=-2,
    )
    j1 = jnp.stack(
        [
            jnp.stack([c, s, zero], axis=-1),
            jnp.stack([-s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return j0, j1


class _System(NamedTuple):
    j0: Array  # [E, 3, 3]
    j1: Array
    lj0: Array  # [E, 3, 3] prec @ j0
    lj1: Array
    g: Array  # [N, 3] gradient  J^T prec e
    diag: Array  # [N, 3, 3] diagonal blocks of H
    free: Array  # [N] bool — nodes that move


def _build_system(graph: PoseGraph, poses: Array, n_fixed: int) -> _System:
    j0, j1 = _edge_jacobians(graph, poses)
    e = residuals(graph, poses)
    prec = jnp.where(
        graph.edge_mask[:, None, None], graph.precisions, 0.0
    )
    lj0 = jnp.einsum("eab,ebc->eac", prec, j0)
    lj1 = jnp.einsum("eab,ebc->eac", prec, j1)

    n = poses.shape[0]
    g = jnp.zeros((n, 3), poses.dtype)
    le = jnp.einsum("eab,eb->ea", prec, e)
    g = g.at[graph.edge_i].add(jnp.einsum("eba,eb->ea", j0, le))
    g = g.at[graph.edge_j].add(jnp.einsum("eba,eb->ea", j1, le))

    diag = jnp.zeros((n, 3, 3), poses.dtype)
    diag = diag.at[graph.edge_i].add(jnp.einsum("eba,ebc->eac", j0, lj0))
    diag = diag.at[graph.edge_j].add(jnp.einsum("eba,ebc->eac", j1, lj1))

    idx = jnp.arange(n)
    free = graph.node_mask & (idx >= n_fixed)
    return _System(j0, j1, lj0, lj1, g, diag, free)


def _hvp(graph: PoseGraph, sys: _System, lam: Array, x: Array) -> Array:
    """(H + lam * blockdiag(H)) x, matrix-free over edges."""
    x = jnp.where(sys.free[:, None], x, 0.0)
    xi = jnp.take(x, graph.edge_i, axis=0)
    xj = jnp.take(x, graph.edge_j, axis=0)
    # prec @ (J0 xi + J1 xj)
    ljx = jnp.einsum("eab,eb->ea", sys.lj0, xi) + jnp.einsum(
        "eab,eb->ea", sys.lj1, xj
    )
    out = jnp.zeros_like(x)
    out = out.at[graph.edge_i].add(jnp.einsum("eba,eb->ea", sys.j0, ljx))
    out = out.at[graph.edge_j].add(jnp.einsum("eba,eb->ea", sys.j1, ljx))
    out = out + lam * jnp.einsum("nab,nb->na", sys.diag, x)
    return jnp.where(sys.free[:, None], out, 0.0)


def _block_inv(diag: Array, free: Array, lam: Array) -> Array:
    """Inverse of (1+lam)-augmented diagonal blocks; identity on fixed."""
    d = diag * (1.0 + lam)
    eye = jnp.eye(3, dtype=diag.dtype)
    d = jnp.where(free[:, None, None], d + 1e-8 * eye, eye)
    return jnp.linalg.inv(d)


def _pcg(
    graph: PoseGraph,
    sys: _System,
    lam: Array,
    rhs: Array,
    num_iters: int,
    tol: float,
) -> Array:
    """Block-Jacobi PCG for (H + lam D) x = rhs (bpcg/bpcg.h:178-330 role)."""
    minv = _block_inv(sys.diag, sys.free, lam)
    rhs = jnp.where(sys.free[:, None], rhs, 0.0)

    def prec_apply(r):
        return jnp.einsum("nab,nb->na", minv, r)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = prec_apply(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    rhs_norm = jnp.sum(rhs * rhs)

    def body(carry, _):
        x, r, p, rz, done = carry
        hp = _hvp(graph, sys, lam, p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), 1e-30)
        xn = x + alpha * p
        rn = r - alpha * hp
        zn = prec_apply(rn)
        rzn = jnp.sum(rn * zn)
        beta = rzn / jnp.maximum(rz, 1e-30)
        pn = zn + beta * p
        new_done = done | (jnp.sum(rn * rn) < tol * tol * rhs_norm)
        keep = lambda new, old: jnp.where(done, old, new)
        return (
            keep(xn, x),
            keep(rn, r),
            keep(pn, p),
            keep(rzn, rz),
            new_done,
        ), None

    (x, _, _, _, _), _ = jax.lax.scan(
        body,
        (x0, r0, p0, rz0, jnp.zeros((), bool)),
        None,
        length=num_iters,
    )
    return x


class SolveStats(NamedTuple):
    initial_cost: Array
    final_cost: Array
    good_iters: Array  # accepted LM steps
    final_lambda: Array


@partial(
    jax.jit,
    static_argnames=("num_iters", "n_fixed", "cg_iters", "gauss_newton"),
)
def optimize(
    graph: PoseGraph,
    *,
    num_iters: int = 40,
    n_fixed: int = 1,
    cg_iters: int = 50,
    cg_tol: float = 1e-6,
    init_lambda: float = 1e-4,
    gauss_newton: bool = False,
) -> tuple[Array, SolveStats]:
    """LM loop (doSPA, spa2d.cpp:425-609); returns optimized poses + stats.

    ``gauss_newton=True`` reproduces plain GN iteration semantics — every
    step is applied UNCONDITIONALLY and lambda stays at ``init_lambda``
    (the reference's g2o adapter runs OptimizationAlgorithmGaussNewton,
    g2o_solver.cc:42-138, which has no step rejection and so can diverge
    on a bad initialization where LM's reject/escalate recovers; the
    backend seam must preserve that behavioral difference, not just the
    iteration caps)."""
    poses0 = graph.poses
    cost0 = cost(graph, poses0)

    def body(carry, _):
        poses, cur_cost, lam, laminc, good, done = carry
        sys = _build_system(graph, poses, n_fixed)
        dx = _pcg(graph, sys, lam, -sys.g, cg_iters, cg_tol)
        sq = jnp.sum(dx * dx)
        converged = sq < 1e-16

        new_poses = poses + dx
        new_poses = new_poses.at[:, 2].set(se2.wrap_angle(new_poses[:, 2]))
        new_cost = cost(graph, new_poses)
        accept = (
            jnp.ones((), bool) if gauss_newton else new_cost < cur_cost
        )

        poses_n = jnp.where(accept, new_poses, poses)
        cost_n = jnp.where(accept, new_cost, cur_cost)
        if gauss_newton:
            lam_n, laminc_n = lam, laminc  # no damping schedule in GN
        else:
            lam_n = jnp.where(accept, lam * 0.5, lam * laminc)
            laminc_n = jnp.where(accept, laminc, laminc * 2.0)
        good_n = good + accept.astype(jnp.int32)

        keep = lambda new, old: jnp.where(done, old, new)
        return (
            keep(poses_n, poses),
            keep(cost_n, cur_cost),
            keep(lam_n, lam),
            keep(laminc_n, laminc),
            keep(good_n, good),
            done | converged,
        ), None

    init = (
        poses0,
        cost0,
        jnp.asarray(init_lambda, poses0.dtype),
        jnp.asarray(2.0, poses0.dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), bool),
    )
    (poses, final_cost, lam, _, good, _), _ = jax.lax.scan(
        body, init, None, length=num_iters
    )
    return poses, SolveStats(
        initial_cost=cost0,
        final_cost=final_cost,
        good_iters=good,
        final_lambda=lam,
    )
