"""Sim3 pose-graph optimization for loop closure.

The reference stitches chunks strictly sequentially (each chunk Sim3-aligned
to its predecessor, utils/reconstruction_alignment.py:40-198), so drift
accumulates without bound on long trajectories. This module adds the classic
SLAM remedy the reference lacks: when a loop closure relates two non-adjacent
chunks, distribute the accumulated error over the whole chain by optimizing
one similarity correction per chunk.

TPU-first design: the graph is solved as a single fixed-shape Gauss-Newton
program — residuals for all edges at once, Jacobian by forward-mode autodiff
through the batched Sim3 retraction X_n <- X_n o exp(xi_n), one dense solve
per iteration (the system is 7N x 7N with N = number of chunks; at SLAM
scale that is a tiny MXU matmul, so a sparse solver would only add
host-side control flow). Residuals are chordal — entries of
(M^-1 X_i^-1 X_j) minus identity — which is smooth everywhere (no log-map
branch cuts inside the optimization loop) and exact at the optimum.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.sim3 import Sim3, sim3_compose, sim3_exp, sim3_inverse
from ..utils.precision import f32_matmul


def stack_sim3(transforms: Sequence[Sim3]) -> Sim3:
    """Stack a list of Sim3 into one batched Sim3 with leading axis N."""
    return Sim3(
        scale=jnp.stack([jnp.asarray(t.scale) for t in transforms]),
        rotation=jnp.stack([jnp.asarray(t.rotation) for t in transforms]),
        translation=jnp.stack([jnp.asarray(t.translation) for t in transforms]),
    )


def index_sim3(batched: Sim3, idx) -> Sim3:
    return Sim3(
        scale=batched.scale[idx],
        rotation=batched.rotation[idx],
        translation=batched.translation[idx],
    )


@dataclasses.dataclass
class PoseGraphResult:
    nodes: Sim3  # batched (N,) corrections / poses
    initial_cost: float
    final_cost: float
    iterations: int


def _edge_residuals(
    nodes: Sim3,
    edges_i: jnp.ndarray,
    edges_j: jnp.ndarray,
    meas_inv: Sim3,
    translation_weight: float,
) -> jnp.ndarray:
    """Chordal residuals (E, 12): rows of (s R - I) plus weighted t of
    err = meas^-1 o X_i^-1 o X_j (identity when the constraint holds)."""
    xi = index_sim3(nodes, edges_i)
    xj = index_sim3(nodes, edges_j)
    err = sim3_compose(meas_inv, sim3_compose(sim3_inverse(xi), xj))
    sr = err.scale[..., None, None] * err.rotation - jnp.eye(3, dtype=err.rotation.dtype)
    return jnp.concatenate(
        [sr.reshape(sr.shape[:-2] + (9,)), translation_weight * err.translation],
        axis=-1,
    )


@f32_matmul
def optimize_sim3_pose_graph(
    nodes_init: Sim3,
    edges_i: jnp.ndarray,
    edges_j: jnp.ndarray,
    measurements: Sim3,
    edge_weights: jnp.ndarray | None = None,
    *,
    iterations: int = 15,
    huber_delta: float = 0.5,
    translation_weight: float = 1.0,
    damping: float = 1e-8,
    fixed_node: int = 0,
) -> PoseGraphResult:
    """Gauss-Newton over per-node Sim3 corrections.

    Edge (i, j) with measurement M constrains X_i^-1 o X_j = M. The gauge is
    fixed by pinning node ``fixed_node`` with a stiff diagonal prior instead
    of eliminating its columns, keeping every shape static. Huber IRLS on the
    per-edge residual norm guards against a bad loop edge surviving the
    geometric verification.
    """
    n = int(nodes_init.scale.shape[0])
    e = int(edges_i.shape[0])
    if edge_weights is None:
        edge_weights = jnp.ones(e, jnp.float32)
    edges_i = jnp.asarray(edges_i, jnp.int32)
    edges_j = jnp.asarray(edges_j, jnp.int32)
    meas_inv = sim3_inverse(
        Sim3(
            jnp.asarray(measurements.scale, jnp.float32),
            jnp.asarray(measurements.rotation, jnp.float32),
            jnp.asarray(measurements.translation, jnp.float32),
        )
    )
    w_edge = jnp.asarray(edge_weights, jnp.float32)

    gauge = jnp.zeros(n * 7, jnp.float32).at[fixed_node * 7 : fixed_node * 7 + 7].set(1e8)

    def cost_of(r):
        # Huber cost on per-edge residual norms
        rn = jnp.linalg.norm(r, axis=-1)
        quad = 0.5 * rn * rn
        lin = huber_delta * (rn - 0.5 * huber_delta)
        return jnp.sum(w_edge * jnp.where(rn <= huber_delta, quad, lin))

    def res_flat(xi_flat, nodes):
        xi = xi_flat.reshape(n, 7)
        retracted = sim3_compose(nodes, sim3_exp(xi))
        return _edge_residuals(
            retracted, edges_i, edges_j, meas_inv, translation_weight
        ).reshape(-1)

    def step(nodes, _):
        r0 = _edge_residuals(nodes, edges_i, edges_j, meas_inv, translation_weight)
        rn = jnp.linalg.norm(r0, axis=-1)
        w_huber = jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-12))
        w_row = jnp.repeat(w_edge * w_huber, 12)  # (E*12,)

        jac = jax.jacfwd(res_flat)(jnp.zeros(n * 7, jnp.float32), nodes)  # (E*12, N*7)
        jtw = jac.T * w_row[None, :]
        h = jtw @ jac
        h = h + jnp.diag(gauge + damping * jnp.maximum(jnp.diag(h), 1.0))
        g = jtw @ r0.reshape(-1)
        delta = -jnp.linalg.solve(h, g)
        new_nodes = sim3_compose(nodes, sim3_exp(delta.reshape(n, 7)))
        return new_nodes, cost_of(r0)

    nodes0 = Sim3(
        jnp.asarray(nodes_init.scale, jnp.float32),
        jnp.asarray(nodes_init.rotation, jnp.float32),
        jnp.asarray(nodes_init.translation, jnp.float32),
    )
    final_nodes, costs = jax.lax.scan(step, nodes0, None, length=iterations)
    final_cost = cost_of(
        _edge_residuals(final_nodes, edges_i, edges_j, meas_inv, translation_weight)
    )
    return PoseGraphResult(
        nodes=final_nodes,
        initial_cost=float(costs[0]),
        final_cost=float(final_cost),
        iterations=iterations,
    )


def sequential_edges(num_nodes: int) -> Tuple[np.ndarray, np.ndarray, List[Sim3]]:
    """Identity-measurement odometry edges (i, i+1): consecutive chunks are
    already stitched by the overlap alignment, so the pose graph should
    preserve their relative placement while absorbing loop error."""
    i = np.arange(num_nodes - 1, dtype=np.int32)
    ident = [
        Sim3(jnp.ones(()), jnp.eye(3), jnp.zeros(3)) for _ in range(num_nodes - 1)
    ]
    return i, i + 1, ident
