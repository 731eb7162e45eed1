"""Host-facing detection API.

Mirrors the reference's `lib.rs` entry points: free function ``detect``
(lib.rs:62-64) and ``Config.detect`` (lib.rs:56-58), returning keypoints in
row-major order exactly like the reference's `Vec<Point>`.

Design: the device side is ONE fused jit program per (shape, config, cap) —
dense detect + score + nonmax + hierarchical word compaction — so a
detection costs a single dispatch and a single small result fetch
(host<->device round trips dominate on a remote-attached TPU).  A batched
variant amortizes dispatch further; it is the production serving path and
what `bench.py` measures.  Backend dispatch picks the fused Pallas kernel
on TPU and the XLA dense pipeline elsewhere.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, NonmaxMode, Point
from .ops import compact, fast

ImageLike = Union[np.ndarray, jax.Array]

#: Initial word-compaction cap (32-pixel words containing >= 1 keypoint);
#: grows geometrically on overflow, so even a pathological all-corners
#: image is handled without dropping keypoints.
_DEFAULT_WORD_CAP = 1 << 14


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _max_word_cap(h: int, w: int) -> int:
    """Upper bound on nonzero 32-pixel words.  The Pallas path packs the
    lane-padded grid, where words align per padded row — up to one extra
    word per row vs flat true-grid packing — so the bound must use the
    padded dimensions or pathological images could retry forever."""
    if _use_pallas():
        from .ops import fast_pallas

        h, w = fast_pallas.padded_height(h), fast_pallas.padded_width(w)
    return -(-h * w // compact.WORD_BITS)


def effective_width(w: int) -> int:
    """Width in which compacted flat indices are encoded: the Pallas path
    compacts directly on its lane-padded grid (padding cells are zero by
    construction), skipping two full-image crop passes; the XLA path uses
    the true width."""
    if _use_pallas():
        from .ops import fast_pallas

        return fast_pallas.padded_width(w)
    return int(w)


def _detect_dense_best(image, threshold: int, count: int, nonmax: NonmaxMode):
    """Backend dispatch: the fused Pallas kernel on TPU, the XLA dense
    pipeline elsewhere.  The reference gates its SIMD backend at compile
    time with no runtime fallback (lib.rs:12-13); here the fallback is
    always available and the choice is made at trace time."""
    if _use_pallas():
        from .ops import fast_pallas

        return fast_pallas.detect_dense_pallas.__wrapped__(
            image, threshold, count, nonmax, False
        )
    return fast.detect_dense(image, threshold, count, nonmax)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _detect_compact(image, threshold: int, count: int, nonmax: NonmaxMode,
                    max_words: int):
    """Fused detect + hierarchical compaction.  Returns
    (word_idx, word_bits, n_points, n_words); see ops.compact.  Indices
    encode flat positions over `effective_width(w)` columns."""
    if _use_pallas():
        from .ops import fast_pallas

        if fast_pallas.words_supported(image.shape[1]):
            # Packed-words kernel: the dense mask never exists in HBM.
            words = fast_pallas.detect_words_padded(
                image, threshold, count, nonmax, False
            )
            wpw = fast_pallas.padded_width(image.shape[1]) // 32
            return compact.compact_packed_words(words, wpw, max_words)
        mask, _ = fast_pallas.detect_dense_padded(
            image, threshold, count, nonmax, False
        )
    else:
        mask, _ = fast.detect_dense(image, threshold, count, nonmax)
    return compact.compact_mask_words(mask, max_words)


def _as_device_image(image: ImageLike, expect_ndim: int) -> jax.Array:
    img = jnp.asarray(image)
    if img.dtype != jnp.uint8:
        raise TypeError(f"expected a uint8 grayscale image, got dtype {img.dtype}")
    if img.ndim != expect_ndim:
        raise ValueError(
            f"expected a {expect_ndim}-D image array, got shape {img.shape}"
        )
    return img


def detect_arrays(
    image: ImageLike,
    config: Optional[Config] = None,
    *,
    max_words: Optional[int] = None,
) -> np.ndarray:
    """Detect keypoints; returns an (N, 2) uint32 array of (x, y) rows in
    row-major image order.  ``max_words`` only sets the initial compaction
    cap — on overflow the cap grows and detection reruns, so results are
    always complete (SURVEY.md §7 hard part iv)."""
    config = config or Config()
    img = _as_device_image(image, 2)
    h, w = img.shape
    cap = int(max_words or _DEFAULT_WORD_CAP)
    max_cap = _max_word_cap(h, w)
    w_eff = effective_width(w)
    while True:
        widx, wbits, n, n_words = _detect_compact(
            img, int(config.threshold), int(config.count), config.nonmax, cap
        )
        n_words = int(n_words)
        if n_words <= cap:
            return _expand_batch(
                np.asarray(widx)[None], np.asarray(wbits)[None],
                np.asarray([int(n)]), w_eff,
            )[0]
        cap = min(max(cap * 4, n_words), max_cap)


def detect(
    image: ImageLike,
    config: Optional[Config] = None,
    *,
    max_words: Optional[int] = None,
) -> List[Point]:
    """Detect keypoints as a list of :class:`Point` (reference: lib.rs:62-64)."""
    xy = detect_arrays(image, config, max_words=max_words)
    return [Point(int(x), int(y)) for x, y in xy]


# ---------------------------------------------------------------------------
# Batched serving path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _detect_compact_batch(images, threshold: int, count: int, nonmax: NonmaxMode,
                          max_words: int):
    def one(im):
        return _detect_compact.__wrapped__(im, threshold, count, nonmax, max_words)

    return jax.vmap(one)(images)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _detect_compact_batch_packed(images, threshold: int, count: int,
                                 nonmax: NonmaxMode, max_words: int):
    """Batched detect + compact with a SINGLE packed int32 output per frame:
    slot 0 the true keypoint count, slot 1 the true nonzero-word count,
    slots [128, 128+cap) the word indices, slots [128+cap, 128+2*cap) the
    word bits.  One output array means one device->host fetch per round —
    the serving-path layout for hosts where readback round trips dominate."""
    mw = int(max_words)

    def one(im):
        widx, wbits, n, n_words = _detect_compact.__wrapped__(
            im, threshold, count, nonmax, mw
        )
        head = jnp.zeros((128,), jnp.int32).at[0].set(n).at[1].set(n_words)
        return jnp.concatenate([head, widx, wbits])

    return jax.vmap(one)(images)


def _expand_batch(widx: np.ndarray, wbits: np.ndarray, n_np: np.ndarray,
                  width: int) -> List[np.ndarray]:
    """Expand a (B, max_words) packed-word batch to per-frame (N_i, 2)
    arrays — through the native threaded host runtime when available
    (runtime/native.py), else the numpy path."""
    from .runtime import native as _native

    if _native.available():
        cap = max(1, int(n_np.max(initial=0)))
        out = _native.expand_words_batch(widx, wbits.view(np.uint32), width,
                                         per_frame_cap=cap)
    else:
        out = [
            compact.expand_words_host(widx[i], wbits[i], int(n_np[i]), width)
            for i in range(widx.shape[0])
        ]
    for i, kp in enumerate(out):
        assert kp.shape[0] == int(n_np[i]), (kp.shape, int(n_np[i]))
    return out


def unpack_batch_packed(packed: np.ndarray, max_words: int, width: int):
    """Host-side decode of `_detect_compact_batch_packed` output into a list
    of (N_i, 2) uint32 keypoint arrays."""
    n_words = packed[:, 1]
    if int(n_words.max(initial=0)) > max_words:
        raise OverflowError(
            f"word cap exceeded: {int(n_words.max())} > {max_words}")
    widx = packed[:, 128 : 128 + max_words]
    wbits = packed[:, 128 + max_words : 128 + 2 * max_words]
    return _expand_batch(widx, wbits, packed[:, 0], width)


def detect_batch_arrays(
    images: ImageLike,
    config: Optional[Config] = None,
    *,
    max_words: Optional[int] = None,
) -> List[np.ndarray]:
    """Detect over a (B, H, W) u8 batch in one dispatch; returns a list of
    per-frame (N_i, 2) uint32 arrays."""
    config = config or Config()
    imgs = _as_device_image(images, 3)
    b, h, w = imgs.shape
    cap = int(max_words or _DEFAULT_WORD_CAP)
    max_cap = _max_word_cap(h, w)
    w_eff = effective_width(w)
    while True:
        widx, wbits, n, n_words = _detect_compact_batch(
            imgs, int(config.threshold), int(config.count), config.nonmax, cap
        )
        n_words_np = np.asarray(n_words)
        if n_words_np.max(initial=0) <= cap:
            widx, wbits, n_np = np.asarray(widx), np.asarray(wbits), np.asarray(n)
            return _expand_batch(widx, wbits, n_np, w_eff)
        cap = min(max(cap * 4, int(n_words_np.max())), max_cap)


def detect_batch_device(
    images: jax.Array,
    config: Optional[Config] = None,
    *,
    max_words: int = _DEFAULT_WORD_CAP,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Device-resident batched detection for on-TPU consumers (descriptors,
    matching): returns (word_idx (B, cap), word_bits (B, cap), n (B,),
    n_words (B,)) without any host transfer."""
    config = config or Config()
    return _detect_compact_batch(
        images, int(config.threshold), int(config.count), config.nonmax,
        int(max_words),
    )
