"""Pose-graph optimization on SE(3), jit-compiled Gauss-Newton/LM.

New scope (BASELINE.json config[3]).  A pose graph is N absolute poses
constrained by relative-pose measurements on edges; the optimizer finds
poses minimizing sum_e || log( Z_e^-1 T_i^-1 T_j ) ||^2_w.

TPU design decisions:
  * fixed-capacity edge arrays with validity bits (static shapes),
  * residuals/Jacobians come from jax autodiff of the local
    parameterization T_i <- exp(delta_i) T_i at delta = 0 — no hand-coded
    Jacobian blocks to get wrong,
  * two solvers: dense normal equations (small graphs; one
    jnp.linalg.solve on the MXU) and matrix-free conjugate gradient using
    jvp/vjp products (large graphs; the product form is what shards over
    a device mesh with psum — see parallel.ba_sharded),
  * gauge freedom fixed by masking pose 0's update.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import lie


class PoseGraph(NamedTuple):
    """Fixed-capacity pose-graph problem."""

    poses: jax.Array  # (N, 4, 4) world_T_body estimates
    edge_i: jax.Array  # (E,) int32 source pose index
    edge_j: jax.Array  # (E,) int32 target pose index
    edge_T: jax.Array  # (E, 4, 4) measured T_i^-1 T_j
    edge_valid: jax.Array  # (E,) bool
    edge_weight: jax.Array  # (E,) float residual weight (sqrt info)


def edge_residuals(poses: jax.Array, g: PoseGraph) -> jax.Array:
    """(E, 6) weighted residuals log(Z^-1 T_i^-1 T_j)."""
    Ti = poses[g.edge_i]
    Tj = poses[g.edge_j]
    rel = lie.se3_inverse(g.edge_T) @ (lie.se3_inverse(Ti) @ Tj)
    r = lie.se3_log(rel)
    w = jnp.where(g.edge_valid, g.edge_weight, 0.0)
    return r * w[:, None]


def _residual_of_delta(delta: jax.Array, g: PoseGraph) -> jax.Array:
    """Residual vector as a function of the stacked local update
    (N, 6); pose 0 is gauge-fixed (its delta is ignored)."""
    delta = delta.at[0].set(0.0)
    poses = lie.se3_exp(delta) @ g.poses
    return edge_residuals(poses, g).reshape(-1)


def _normal_system(g: PoseGraph):
    """(JtJ matvec, Jtr, r2) via jvp/vjp at delta=0 — matrix-free."""
    n = g.poses.shape[0]
    zero = jnp.zeros((n, 6), g.poses.dtype)
    r0, vjp = jax.vjp(lambda d: _residual_of_delta(d, g), zero)

    def jtj_v(v):
        _, jv = jax.jvp(lambda d: _residual_of_delta(d, g), (zero,), (v,))
        return vjp(jv)[0]

    jtr = vjp(r0)[0]
    return jtj_v, jtr, jnp.sum(r0 * r0)


def _cg(matvec, b, iters: int, damping):
    """Plain conjugate gradient on (A + damping I) x = b, fixed iterations
    (no data-dependent control flow — TPU-friendly)."""

    def a(v):
        return matvec(v) + damping * v

    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r)

    def body(_, state):
        x, r, p, rs = state
        ap = a(p)
        denom = jnp.maximum(jnp.sum(p * ap), 1e-20)
        alpha = rs / denom
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def optimize(
    g: PoseGraph,
    iterations: int = 10,
    solver: str = "dense",
    cg_iters: int = 50,
    damping: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """Levenberg-style Gauss-Newton.  Returns (poses, per-iteration cost)."""
    n = g.poses.shape[0]

    def step(poses, _):
        gg = g._replace(poses=poses)
        jtj_v, jtr, r2 = _normal_system(gg)
        if solver == "dense":
            eye = jnp.eye(n * 6, dtype=poses.dtype)
            J_cols = jax.vmap(lambda e: jtj_v(e.reshape(n, 6)).reshape(-1))(eye)
            H = J_cols.T + damping * eye
            delta = -jnp.linalg.solve(H, jtr.reshape(-1)).reshape(n, 6)
        else:  # "cg"
            delta = -_cg(jtj_v, jtr, cg_iters, damping)
        delta = delta.at[0].set(0.0)
        new_poses = lie.se3_exp(delta) @ poses
        # accept only if cost decreases (cheap safeguard)
        new_r = edge_residuals(new_poses, g)
        new_r2 = jnp.sum(new_r * new_r)
        better = new_r2 < r2
        poses = jnp.where(better, new_poses, poses)
        return poses, jnp.minimum(new_r2, r2)

    poses, costs = jax.lax.scan(step, g.poses, None, length=iterations)
    return poses, costs
