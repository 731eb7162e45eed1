"""Two-view geometry: essential matrix estimation, pose recovery,
triangulation — batched RANSAC the TPU way.

New scope (BASELINE.json config[3]: "FAST + descriptor matching +
pose-graph on a monocular sequence").  Design: RANSAC is not a loop with
early exit — it is a BATCH of H hypotheses evaluated in parallel (vmapped
8-point solves + vectorized inlier counts), then an argmax.  Fixed-capacity
correspondence slots with validity bits come straight from the matcher.

All math in normalized camera coordinates (intrinsics applied by the
caller via `normalize_points`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole intrinsics."""

    fx: float
    fy: float
    cx: float
    cy: float

    def matrix(self, dtype=jnp.float32) -> jax.Array:
        return jnp.asarray(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype,
        )


def normalize_points(pts: jax.Array, cam: Camera) -> jax.Array:
    """Pixel (..., 2) -> normalized camera coordinates (..., 2)."""
    x = (pts[..., 0] - cam.cx) / cam.fx
    y = (pts[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def _eight_point(pa: jax.Array, pb: jax.Array) -> jax.Array:
    """Essential matrix from >= 8 normalized correspondences (N, 2) each.

    Linear 8-point: build the epipolar constraint matrix, take the
    null-ish singular vector, project onto the essential manifold
    (two equal singular values, third zero).
    """
    xa, ya = pa[..., 0], pa[..., 1]
    xb, yb = pb[..., 0], pb[..., 1]
    ones = jnp.ones_like(xa)
    # constraint: pb^T E pa = 0
    A = jnp.stack(
        [xb * xa, xb * ya, xb, yb * xa, yb * ya, yb, xa, ya, ones], axis=-1
    )  # (N, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[..., -1, :]
    E = e.reshape(*e.shape[:-1], 3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    sbar = (s[..., 0] + s[..., 1]) / 2.0
    s_proj = jnp.stack([sbar, sbar, jnp.zeros_like(sbar)], axis=-1)
    return u @ (s_proj[..., :, None] * vt2)


def sampson_error(E: jax.Array, pa: jax.Array, pb: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) epipolar error for E, batched over
    points: pa, pb (N, 2) normalized; returns (N,)."""
    ha = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], axis=-1)  # (N,3)
    hb = jnp.concatenate([pb, jnp.ones_like(pb[..., :1])], axis=-1)
    Ea = ha @ jnp.swapaxes(E, -1, -2)  # = (E @ pa)^T rows -> (N, 3)
    Etb = hb @ E  # (N, 3)
    num = jnp.sum(hb * Ea, axis=-1) ** 2
    den = Ea[..., 0] ** 2 + Ea[..., 1] ** 2 + Etb[..., 0] ** 2 + Etb[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnums=(4,))
def ransac_essential(
    pa: jax.Array,
    pb: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    hypotheses: int = 256,
    threshold: float = 1e-4,
) -> Tuple[jax.Array, jax.Array]:
    """Batched-hypothesis RANSAC for E.

    pa, pb: (K, 2) normalized correspondences (slots), valid: (K,) bool.
    Returns (E (3, 3), inlier mask (K,)).  All H hypotheses are solved and
    scored in parallel (no data-dependent control flow), then the best is
    re-fit on its inliers once.
    """
    k = pa.shape[0]
    # Minimal samples WITHOUT replacement: rank a uniform key per (slot,
    # hypothesis), push invalid slots to the back, take each hypothesis's
    # 8 best — 8 DISTINCT valid slots whenever >= 8 exist.  Sampling with
    # replacement made a hypothesis contain duplicate correspondences with
    # high probability at small n_valid (~55% at 20), and a duplicated row
    # leaves the 8-point system rank-deficient — a wasted hypothesis.
    r = jax.random.uniform(key, (hypotheses, k))
    r = jnp.where(valid[None, :], r, 2.0)  # invalid slots rank last
    _, sample_idx = jax.lax.top_k(-r, 8)  # (H, 8) distinct slot indices

    Es = jax.vmap(lambda si: _eight_point(pa[si], pb[si]))(sample_idx)  # (H,3,3)
    errs = jax.vmap(lambda E: sampson_error(E, pa, pb))(Es)  # (H, K)
    inl = (errs < threshold) & valid[None, :]
    scores = inl.sum(axis=-1)
    best = jnp.argmax(scores)
    best_inl = inl[best]

    # Guided re-fit iterations on the running inlier set (weighted by the
    # inlier mask so the solves stay static-shape); keep whichever model
    # has the larger consensus.
    E_final, inl_final, score_final = Es[best], best_inl, scores[best]
    for _ in range(2):
        w = inl_final.astype(pa.dtype)[:, None]
        E_refit = _eight_point_weighted(pa, pb, w)
        err_refit = sampson_error(E_refit, pa, pb)
        inl_refit = (err_refit < threshold) & valid
        use = inl_refit.sum() >= score_final
        E_final = jnp.where(use, E_refit, E_final)
        inl_final = jnp.where(use, inl_refit, inl_final)
        score_final = jnp.maximum(inl_refit.sum(), score_final)
    return E_final, inl_final


def _eight_point_weighted(pa, pb, w):
    xa, ya = pa[..., 0], pa[..., 1]
    xb, yb = pb[..., 0], pb[..., 1]
    ones = jnp.ones_like(xa)
    A = jnp.stack(
        [xb * xa, xb * ya, xb, yb * xa, yb * ya, yb, xa, ya, ones], axis=-1
    )
    A = A * w
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[-1]
    E = e.reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    sbar = (s[0] + s[1]) / 2.0
    return u @ jnp.diag(jnp.asarray([sbar, sbar, 0.0], E.dtype)) @ vt2


def triangulate(
    Ra: jax.Array, ta: jax.Array, Rb: jax.Array, tb: jax.Array,
    pa: jax.Array, pb: jax.Array,
) -> jax.Array:
    """Linear (DLT) triangulation, batched over correspondences.

    (Ra|ta), (Rb|tb): world->camera extrinsics; pa, pb (N, 2) normalized.
    Returns (N, 3) world points.
    """
    Pa = jnp.concatenate([Ra, ta[..., None]], axis=-1)  # (3, 4)
    Pb = jnp.concatenate([Rb, tb[..., None]], axis=-1)

    def one(qa, qb):
        rows = jnp.stack(
            [
                qa[0] * Pa[2] - Pa[0],
                qa[1] * Pa[2] - Pa[1],
                qb[0] * Pb[2] - Pb[0],
                qb[1] * Pb[2] - Pb[1],
            ]
        )
        _, _, vt = jnp.linalg.svd(rows)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(pa, pb)


def ray_depths(
    R: jax.Array, t: jax.Array, pa: jax.Array, pb: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Closed-form two-view ray depths, batched over correspondences.

    Solves min || za * (R qa) - zb * qb + t ||^2 for the depths (za, zb)
    along the two rays (qa = [pa, 1], qb = [pb, 1]; convention
    x_b = R x_a + t) — a 2x2 least squares with a Cramer solution, so
    the whole batch is elementwise arithmetic: no per-point SVD.

    Round-4 motivation: the homogeneous-DLT `triangulate` runs one 4x4
    SVD per correspondence, and the VO pipeline triangulated every pair
    SIX times (4 cheirality candidates + depths + refine) — measured
    279 ms per (63, 512) call on the v5e vs ~1 ms for this form; tiny
    batched SVDs are the single most expensive op in the geometry stage.
    Cheirality needs only the SIGNS of (za, zb) and scale chaining needs
    depth RATIOS, both of which this least-squares form provides with
    2x2 conditioning (the f32 3x3 normal-equation DLT loses up to ~0.3
    units on low-parallax points — measured and rejected; full-accuracy
    multi-view structure still uses DLT/SVD in BA init).

    Degenerate (near-parallel) rays give a near-zero denominator; the
    clamp sends such depths to huge magnitudes, which every consumer
    gates (depth > eps, finite checks)."""
    qa = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], axis=-1)
    qb = jnp.concatenate([pb, jnp.ones_like(pb[..., :1])], axis=-1)
    u = qa @ R.T  # (N, 3) rotated first-frame rays
    uu = jnp.sum(u * u, axis=-1)
    vv = jnp.sum(qb * qb, axis=-1)
    uv = jnp.sum(u * qb, axis=-1)
    ut = u @ t
    vt = qb @ t
    den = uu * vv - uv * uv
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    za = (uv * vt - ut * vv) / den
    zb = (uu * vt - uv * ut) / den
    return za, zb


def recover_pose(
    E: jax.Array, pa: jax.Array, pb: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decompose E into the (R, t) with maximal cheirality support.

    Convention: camera A at identity, camera B extrinsic x_b = R x_a + t
    (world frame = camera A).  Returns (R (3,3), t (3,) unit norm,
    n_support).  All four candidates are evaluated branchlessly.
    """
    u, s, vt = jnp.linalg.svd(E)
    # Make U and V proper rotations individually (negating a column/row of
    # an orthogonal matrix with det=-1); then U W V^T and U W^T V^T are
    # guaranteed rotations.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    def support(R, tt):
        # Cheirality needs only depth SIGNS: the closed-form ray depths
        # replace a per-point 4x4 SVD triangulation (see ray_depths).
        za, zb = ray_depths(R, tt, pa, pb)
        finite = jnp.isfinite(za) & jnp.isfinite(zb)
        return ((za > 1e-6) & (zb > 1e-6) & valid & finite).sum()

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    supports = jnp.stack([support(R, tt) for R, tt in cands])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    best = jnp.argmax(supports)
    return Rs[best], ts[best], supports[best]
