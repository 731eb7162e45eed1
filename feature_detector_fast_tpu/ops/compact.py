"""Dense-mask to keypoint-list compaction.

TPU kernels have static shapes, so detection produces a dense (H, W) mask;
the variable-length keypoint list the reference API returns
(`Vec<Point>`, lib.rs:56-64) is recovered by compaction.  Inside jit we use
a size-capped nonzero (fixed output shape); the host-side wrapper in
`api.py` grows the cap and retries if it ever overflows, so no keypoint can
be silently dropped (SURVEY.md §7 hard part iv).

Emission order is row-major ((y, x) lexicographic), matching the
reference's row-scan push order (fast_simd.rs:550,581) — this matters for
golden hashing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def compact_mask(mask: jax.Array, max_points: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Extract up to ``max_points`` (x, y) coordinates from a boolean mask.

    Returns ``(xy, n, overflow)`` where ``xy`` is (max_points, 2) uint32 in
    row-major order (padded rows are (0, H)), ``n`` is the true number of
    set pixels, and ``overflow`` is ``n > max_points``.
    """
    h, w = mask.shape
    flat = mask.reshape(-1)
    n = jnp.sum(flat, dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=int(max_points), fill_value=h * w)
    x = (idx % w).astype(jnp.uint32)
    y = (idx // w).astype(jnp.uint32)
    return jnp.stack([x, y], axis=-1), n, n > max_points


@functools.partial(jax.jit, static_argnums=(1,))
def compact_mask_jit(mask: jax.Array, max_points: int):
    return compact_mask(mask, max_points)


def compact_scored_mask(
    mask: jax.Array, score: jax.Array, max_points: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Like :func:`compact_mask` but also gathers per-keypoint scores."""
    h, w = mask.shape
    flat = mask.reshape(-1)
    n = jnp.sum(flat, dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=int(max_points), fill_value=h * w)
    x = (idx % w).astype(jnp.uint32)
    y = (idx // w).astype(jnp.uint32)
    s = score.reshape(-1).at[jnp.minimum(idx, h * w - 1)].get().astype(jnp.uint16)
    s = jnp.where(idx < h * w, s, 0)
    return jnp.stack([x, y], axis=-1), s, n, n > max_points
