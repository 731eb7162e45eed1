"""Host-facing detection API.

Mirrors the reference's `lib.rs` entry points: free function ``detect``
(lib.rs:62-64) and ``Config.detect`` (lib.rs:56-58), returning keypoints in
row-major order exactly like the reference's `Vec<Point>`.

Design: the device side is ONE fused jit program per (shape, config, cap) —
dense detect + score + nonmax + compaction — so a detection costs a single
dispatch and a single result fetch (host<->device round trips dominate on a
remote-attached TPU).  A batched variant amortizes dispatch further; it is
the production serving path and what `bench.py` measures.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, NonmaxMode, Point
from .ops import fast

ImageLike = Union[np.ndarray, jax.Array]

#: Initial compaction cap; grows geometrically on overflow, so even a
#: pathological all-corners image is handled without dropping keypoints.
_DEFAULT_CAP = 1 << 15


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _detect_compact(image, threshold: int, count: int, nonmax: NonmaxMode, cap: int):
    """Fused detect + compact: returns (flat row-major indices (cap,),
    true count).  Indices encode y * W + x; padding slots hold H*W."""
    mask, _ = fast.detect_dense(image, threshold, count, nonmax)
    flat = mask.reshape(-1)
    n = jnp.sum(flat, dtype=jnp.int32)
    (idx,) = jnp.nonzero(flat, size=int(cap), fill_value=flat.size)
    return idx.astype(jnp.int32), n


def _as_device_image(image: ImageLike, expect_ndim: int) -> jax.Array:
    img = jnp.asarray(image)
    if img.dtype != jnp.uint8:
        raise TypeError(f"expected a uint8 grayscale image, got dtype {img.dtype}")
    if img.ndim != expect_ndim:
        raise ValueError(
            f"expected a {expect_ndim}-D image array, got shape {img.shape}"
        )
    return img


def _indices_to_xy(idx: np.ndarray, n: int, width: int) -> np.ndarray:
    idx = idx[:n].astype(np.uint32)
    return np.stack([idx % width, idx // width], axis=-1)


def detect_arrays(
    image: ImageLike,
    config: Optional[Config] = None,
    *,
    max_points: Optional[int] = None,
) -> np.ndarray:
    """Detect keypoints; returns an (N, 2) uint32 array of (x, y) rows in
    row-major image order.  ``max_points`` only sets the initial compaction
    cap — on overflow the cap grows and detection reruns, so results are
    always complete (SURVEY.md §7 hard part iv)."""
    config = config or Config()
    img = _as_device_image(image, 2)
    h, w = img.shape
    cap = int(max_points or _DEFAULT_CAP)
    while True:
        idx, n = _detect_compact(
            img, int(config.threshold), int(config.count), config.nonmax, cap
        )
        n = int(n)
        if n <= cap:
            return _indices_to_xy(np.asarray(idx), n, w)
        cap = min(max(cap * 4, n), h * w)


def detect(
    image: ImageLike,
    config: Optional[Config] = None,
    *,
    max_points: Optional[int] = None,
) -> List[Point]:
    """Detect keypoints as a list of :class:`Point` (reference: lib.rs:62-64)."""
    xy = detect_arrays(image, config, max_points=max_points)
    return [Point(int(x), int(y)) for x, y in xy]


# ---------------------------------------------------------------------------
# Batched serving path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _detect_compact_batch(images, threshold: int, count: int, nonmax: NonmaxMode,
                          cap: int):
    def one(im):
        return _detect_compact.__wrapped__(im, threshold, count, nonmax, cap)

    return jax.vmap(one)(images)


def detect_batch_arrays(
    images: ImageLike,
    config: Optional[Config] = None,
    *,
    max_points: Optional[int] = None,
) -> List[np.ndarray]:
    """Detect over a (B, H, W) u8 batch in one dispatch; returns a list of
    per-frame (N_i, 2) uint32 arrays."""
    config = config or Config()
    imgs = _as_device_image(images, 3)
    b, h, w = imgs.shape
    cap = int(max_points or _DEFAULT_CAP)
    while True:
        idx, n = _detect_compact_batch(
            imgs, int(config.threshold), int(config.count), config.nonmax, cap
        )
        counts = np.asarray(n)
        if counts.max(initial=0) <= cap:
            idx = np.asarray(idx)
            return [
                _indices_to_xy(idx[i], int(counts[i]), w) for i in range(b)
            ]
        cap = min(max(cap * 4, int(counts.max())), h * w)


def detect_batch_device(
    images: jax.Array,
    config: Optional[Config] = None,
    *,
    max_points: int = _DEFAULT_CAP,
) -> Tuple[jax.Array, jax.Array]:
    """Device-resident batched detection for on-TPU consumers (descriptors,
    matching): returns (flat indices (B, cap) int32, counts (B,) int32)
    without any host transfer."""
    config = config or Config()
    return _detect_compact_batch(
        images, int(config.threshold), int(config.count), config.nonmax,
        int(max_points),
    )
