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

from ..utils.precision import matmul_highest
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


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5))
@matmul_highest
def optimize(
    g: PoseGraph,
    iterations: int = 10,
    solver: str = "dense",
    cg_iters: int = 50,
    damping: float = 1e-6,
    robust_delta: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Levenberg-style Gauss-Newton.  Returns (poses, per-iteration cost).

    ``robust_delta > 0`` enables Geman-McClure IRLS: each iteration
    reweights edge e by delta^2/(delta^2 + ||r_e||^2) of its CURRENT
    residual norm.  The kernel REDESCENDS — influence rho*w^2 -> 0 as the
    residual grows — so a wildly inconsistent edge (a bad loop-closure
    hypothesis; at image level a degenerate RANSAC model can carry a high
    inlier count) is effectively switched off instead of dragging the
    chain, which a bounded-influence (Huber) kernel measurably still
    does.  Acceptance compares the Geman-McClure cost
    rho^2*delta^2/(delta^2+rho^2).  delta ~ the residual norm where
    influence peaks (se3-log units).

    Damping is ADAPTIVE Levenberg-Marquardt carried through the scan:
    ``damping`` seeds lambda; a rejected step multiplies it, an accepted
    one shrinks it.  Fixed-damping Gauss-Newton measurably stalls on
    loop-closure graphs (one accepted step, then every full step
    overshoots).  Acceptance also requires a FINITE new cost: XLA-fused
    f32 can produce NaN in the solve where the eager computation does
    not, and an unguarded ``NaN < r2`` silently freezes the optimizer."""
    n = g.poses.shape[0]

    def robust_cost(poses):
        r = edge_residuals(poses, g)
        rho2 = jnp.sum(r * r, axis=-1)
        d2 = robust_delta * robust_delta
        return jnp.sum(d2 * rho2 / (d2 + rho2))

    def step(carry, _):
        poses, lam = carry
        gg = g._replace(poses=poses)
        if robust_delta > 0.0:
            # One edge_residuals evaluation serves both the IRLS weights
            # and the current robust cost (gg still carries g's original
            # weights here, so this equals robust_cost(poses) exactly).
            r_cur = edge_residuals(poses, gg)
            rho2 = jnp.sum(r_cur * r_cur, axis=-1)
            d2 = robust_delta * robust_delta
            # NOTE: s is the CAUCHY/Lorentzian IRLS weight, not the GM
            # weight (which would be s*s).  The step therefore descends
            # the Cauchy kernel — gentler down-weighting — while
            # ACCEPTANCE below still guards the monitored GM cost, so
            # every accepted step strictly decreases the GM objective.
            # (ADVICE r3: documented rather than squared — acceptance
            # already guarantees monotone GM descent, and the gentler
            # weight keeps more gradient on large-residual loop edges.)
            s = d2 / (d2 + rho2)
            r2_cur = jnp.sum(d2 * rho2 / (d2 + rho2))
            gg = gg._replace(edge_weight=g.edge_weight * s)
        if solver == "dense":
            # Forward-mode Jacobian + explicit JtJ.  NOT vjp: reverse-mode
            # through se3_log near-pi edges produces NaN under XLA fusion
            # (f32, jit) where both the eager computation and forward-mode
            # are finite — and one NaN row of J poisons the whole system.
            zero = jnp.zeros((n, 6), poses.dtype)
            r0 = _residual_of_delta(zero, gg)
            J = jax.jacfwd(lambda d: _residual_of_delta(d, gg))(zero)
            J = J.reshape(r0.size, n * 6)
            r2 = jnp.sum(r0 * r0)
            jtr = J.T @ r0
            H = J.T @ J + lam * jnp.eye(n * 6, dtype=poses.dtype)
            delta = -jnp.linalg.solve(H, jtr).reshape(n, 6)
        else:  # "cg"
            jtj_v, jtr, r2 = _normal_system(gg)
            delta = -_cg(jtj_v, jtr, cg_iters, lam)
        if robust_delta > 0.0:
            r2 = r2_cur
        delta = delta.at[0].set(0.0)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        new_poses = lie.se3_exp(delta) @ poses
        if robust_delta > 0.0:
            new_r2 = robust_cost(new_poses)
        else:
            new_r = edge_residuals(new_poses, g)
            new_r2 = jnp.sum(new_r * new_r)
        better = jnp.isfinite(new_r2) & (new_r2 < r2)
        poses = jnp.where(better, new_poses, poses)
        lam = jnp.where(better, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 8.0, 1e8))
        cost = jnp.where(better, new_r2, r2)
        return (poses, lam), cost

    lam0 = jnp.asarray(damping, g.poses.dtype)
    (poses, _), costs = jax.lax.scan(step, (g.poses, lam0), None,
                                     length=iterations)
    return poses, costs


@functools.partial(jax.jit, static_argnums=(5,))
@matmul_highest
def rotation_average(
    R: jax.Array,
    edge_i: jax.Array,
    edge_j: jax.Array,
    edge_R: jax.Array,
    edge_weight: jax.Array,
    iters: int = 8,
    robust_sigma: float = 0.1,
) -> jax.Array:
    """Global rotation averaging: refine absolute rotations ``R`` (N,3,3)
    so that Rw_j ~= Rw_i @ edge_R_e over the relative-rotation graph.

    Why a dedicated rotation-only stage exists next to `optimize`: the
    SE(3) pose graph couples rotation residuals to translation residuals,
    so monocular per-step SCALE noise (ratio errors of 2-4x on bad pairs)
    leaks into the solved rotations — measured ~5 deg median / ~9 deg max
    absolute rotation error after loop closure on the staged 32-frame
    circuit, enough to trap downstream bundle adjustment in a deformed
    local minimum (cost 1.3 vs 0.74 in the true basin).  Relative
    rotations themselves are clean (~0.3 deg per refined pair), and
    averaging them alone recovers absolutes to ~1 deg, which IS inside
    BA's convergence basin (round-4 measurements; VERDICT r3 #1).

    Each iteration linearizes with left-multiplicative so(3) increments
    r_k (Rw_k <- exp(r_k) Rw_k): residual v_e = log(Rw_i Re Rw_j^T)
    changes to first order as v_e + r_i - r_j, so the LS normal matrix is
    a weighted graph Laplacian L (x) I_3 — solved as ONE (N-1, N-1)
    dense solve with 3 right-hand sides on the MXU, no 3Nx3N system.
    Cauchy weights (scale ``robust_sigma``, radians) guard outlier edges.
    Gauge: r_0 = 0.
    """
    n = R.shape[0]
    ei = jnp.asarray(edge_i, jnp.int32)
    ej = jnp.asarray(edge_j, jnp.int32)
    ew = jnp.asarray(edge_weight)

    def iteration(Rw, _):
        v = jax.vmap(
            lambda i, j, Re: lie.so3_log(Rw[i] @ Re @ Rw[j].T)
        )(ei, ej, edge_R)  # (E, 3)
        rn2 = jnp.sum(v * v, axis=-1)
        w = ew / (1.0 + rn2 / (robust_sigma * robust_sigma))
        w2 = w * w
        L = (
            jnp.zeros((n, n), R.dtype)
            .at[ei, ei].add(w2)
            .at[ej, ej].add(w2)
            .at[ei, ej].add(-w2)
            .at[ej, ei].add(-w2)
        )
        rhs = (
            jnp.zeros((n, 3), R.dtype)
            .at[ej].add(w2[:, None] * v)
            .at[ei].add(-w2[:, None] * v)
        )
        eye = jnp.eye(n - 1, dtype=R.dtype)
        r = jnp.linalg.solve(L[1:, 1:] + 1e-9 * eye, rhs[1:])  # (n-1, 3)
        r = jnp.concatenate([jnp.zeros((1, 3), R.dtype), r])
        r = jnp.where(jnp.isfinite(r), r, 0.0)
        return jax.vmap(lie.so3_exp)(r) @ Rw, None

    Rw, _ = jax.lax.scan(iteration, R, None, length=iters)
    return Rw


def solve_scale_drift(
    n: int,
    con_i: jax.Array,
    con_j: jax.Array,
    con_log: jax.Array,
    con_weight: jax.Array,
    smooth_weight: float = 1.0,
) -> jax.Array:
    """Estimate per-segment monocular log scale-drift by LINEAR least
    squares (the scale component of Strasdat-style drift correction,
    solved in closed form instead of inside the nonconvex joint Sim(3)
    problem, whose basin from a drifted init is measurably treacherous).

    Variables x_k = log of segment k's chain-scale error factor,
    k in [0, n).  Rows:
      * smoothness: x_{k+1} - x_k = 0, weight ``smooth_weight`` (scale
        chaining drifts as a random walk),
      * measurements: x_{con_i[m]} - x_{con_j[m]} = con_log[m] with
        ``con_weight[m]`` (a loop pair's depth-ratio observation of the
        relative drift between two segments).
    Gauge x_0 = 0 via a strong prior row.  Returns x (n,), the log
    correction to DIVIDE out of each segment's translation.

    Solved on the HOST in float64: the system is a few hundred rows by
    n ~ F columns — `jnp.linalg.lstsq` lowered it to a device SVD that
    cost 0.18 s per call through the relay (round-5 back-end profile)
    vs ~1 ms of numpy, and every caller consumes the result on the host
    anyway."""
    import numpy as np

    con_i = np.asarray(con_i, np.int64)
    con_j = np.asarray(con_j, np.int64)
    m = con_i.shape[0]
    rows = (n - 1) + m + 1
    A = np.zeros((rows, n))
    b = np.zeros((rows,))
    k = np.arange(n - 1)
    A[k, k + 1] += smooth_weight
    A[k, k] += -smooth_weight
    r = n - 1 + np.arange(m)
    w = np.asarray(con_weight, np.float64)
    np.add.at(A, (r, con_i), w)
    np.add.at(A, (r, con_j), -w)
    b[r] = np.asarray(con_log, np.float64) * w
    A[rows - 1, 0] = 1e3  # gauge: x_0 = 0
    x, *_ = np.linalg.lstsq(A, b, rcond=None)
    return x  # host array: every caller consumes it host-side
