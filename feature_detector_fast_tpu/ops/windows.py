"""Circular windowed reductions over the 16 circle taps.

The heart of FAST is the wraparound "n consecutive" arc test.  The reference
implements it by rotating a byte mask 16 times and testing all-ones
(fast_simd.rs:244-295); its score kernel runs 16 explicit windowed min/max
scans (fast_simd.rs:663-695).  Neither shape suits a TPU: VPU lanes cannot
branch per-pixel and rotate-heavy inner loops serialize.

Instead we use an addition-chain reduction.  Let ``g_k[s]`` be the reduction
(AND / min / max) of ``k`` consecutive ring elements starting at position
``s``.  Then

    g_1[s]     = m[s]
    g_{a+b}[s] = combine(g_a[s], g_b[(s + a) mod 16])

so any window length n is reached in O(log n) combine layers, each a pure
elementwise VPU op over whole image planes.  The ring is represented as a
Python list of 16 planes — ring rotation is list re-indexing at trace time,
so compiled code contains only elementwise ops with zero data movement.

These helpers are array-library agnostic: they work for jnp arrays, numpy
arrays, or Pallas in-VMEM values, since they only call the supplied combine.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, TypeVar

T = TypeVar("T")

RING = 16


def ring_windowed(
    planes: Sequence[T],
    n: int,
    combine: Callable[[T, T], T],
) -> List[T]:
    """All 16 circular windowed reductions of length ``n``.

    Returns ``out`` with ``out[s] = combine(planes[s], planes[s+1], ...,
    planes[(s+n-1) % 16])`` for each start ``s`` in 0..16.

    ``combine`` must be associative (AND, OR, min, max, +).
    """
    if not (1 <= n <= 2 * RING):
        raise ValueError(f"window length must be in 1..=32, got {n}")
    if len(planes) != RING:
        raise ValueError(f"expected {RING} planes, got {len(planes)}")

    # cache[k] = list of 16 planes, cache[k][s] = reduction of k starting at s
    cache = {1: list(planes)}

    def get(k: int) -> List[T]:
        got = cache.get(k)
        if got is not None:
            return got
        half = k // 2
        a = get(half)
        b = get(k - half)
        out = [combine(a[s], b[(s + half) % RING]) for s in range(RING)]
        cache[k] = out
        return out

    return get(n)


def ring_any_window_all(planes: Sequence[T], n: int, logical_and, logical_or) -> T:
    """Does ANY circular window of length ``n`` have all elements true?

    This is the FAST arc test: planes[i] is the per-pixel boolean "circle
    point i exceeds the threshold"; the result is the per-pixel keypoint
    candidacy (reference semantics: opencv_compat.rs:140-165).
    """
    windows = ring_windowed(planes, n, logical_and)
    acc = windows[0]
    for s in range(1, RING):
        acc = logical_or(acc, windows[s])
    return acc


def ring_max_of_window_min(planes: Sequence[T], n: int, minimum, maximum) -> T:
    """max over starts s of (min over the length-n window at s).

    Used by the MaxThreshold score: ``extreme_highest`` in the reference
    (opencv_compat.rs:195-199).
    """
    windows = ring_windowed(planes, n, minimum)
    acc = windows[0]
    for s in range(1, RING):
        acc = maximum(acc, windows[s])
    return acc


def ring_min_of_window_max(planes: Sequence[T], n: int, minimum, maximum) -> T:
    """min over starts s of (max over the length-n window at s).

    ``extreme_lowest`` in the reference (opencv_compat.rs:201-204).
    """
    windows = ring_windowed(planes, n, maximum)
    acc = windows[0]
    for s in range(1, RING):
        acc = minimum(acc, windows[s])
    return acc
