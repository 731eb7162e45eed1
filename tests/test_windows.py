"""Fuzz tests of the circular windowed reductions against direct scans.

Mirror of the reference's tier-1 SIMD-primitive fuzz tests
(fast_simd.rs:1089-1236): seeded random inputs, primitive vs trivially
correct scalar equivalent.
"""

import numpy as np
import pytest

from feature_detector_fast_tpu.ops import windows


def _direct_window(vals, s, n, combine):
    acc = vals[s % 16]
    for i in range(1, n):
        acc = combine(acc, vals[(s + i) % 16])
    return acc


@pytest.mark.parametrize("n", list(range(1, 17)))
def test_ring_windowed_and(rng, n):
    for _ in range(200):
        vals = [bool(v) for v in rng.integers(0, 2, 16)]
        got = windows.ring_windowed(vals, n, lambda a, b: a and b)
        for s in range(16):
            assert got[s] == _direct_window(vals, s, n, lambda a, b: a and b)


@pytest.mark.parametrize("n", [9, 10, 11, 12, 13, 14, 15, 16])
def test_ring_windowed_min_max(rng, n):
    for _ in range(200):
        vals = [int(v) for v in rng.integers(-300, 300, 16)]
        gmin = windows.ring_windowed(vals, n, min)
        gmax = windows.ring_windowed(vals, n, max)
        for s in range(16):
            assert gmin[s] == _direct_window(vals, s, n, min)
            assert gmax[s] == _direct_window(vals, s, n, max)


@pytest.mark.parametrize("n", [9, 12, 16])
def test_ring_any_window_all_matches_cycle_scan(rng, n):
    """Equivalence with the reference's cycle().skip(s).take_while() scan
    (opencv_compat.rs:140-165, unit cases opencv_compat.rs:310-346)."""

    def cycle_scan(flags, consecutive):
        for s in range(16):
            run = 0
            for i in range(16):
                if flags[(s + i) % 16]:
                    run += 1
                else:
                    break
            if run >= consecutive:
                return True
        return False

    for _ in range(500):
        flags = [bool(v) for v in rng.integers(0, 2, 16)]
        got = windows.ring_any_window_all(
            flags, n, lambda a, b: a and b, lambda a, b: a or b
        )
        assert got == cycle_scan(flags, n)


def test_ring_any_window_all_reference_cases():
    """The reference's hand-written consecutive-run cases, adapted to the
    16-ring (opencv_compat.rs:327-345 use shorter rings; the predicate is
    the same)."""
    AND = lambda a, b: a and b
    OR = lambda a, b: a or b

    def pad16(bits):
        return list(bits) + [False] * (16 - len(bits))

    # all-false except short runs cannot reach 9
    assert not windows.ring_any_window_all(pad16([True] * 8), 9, AND, OR)
    assert windows.ring_any_window_all(pad16([True] * 9), 9, AND, OR)
    # wraparound run: 5 at the end + 4 at the start = 9 consecutive
    flags = [True] * 4 + [False] * 7 + [True] * 5
    assert windows.ring_any_window_all(flags, 9, AND, OR)
    assert not windows.ring_any_window_all(flags, 10, AND, OR)
    # full ring
    assert windows.ring_any_window_all([True] * 16, 16, AND, OR)
    one_gap = [True] * 15 + [False]
    assert not windows.ring_any_window_all(one_gap, 16, AND, OR)
    assert windows.ring_any_window_all(one_gap, 15, AND, OR)
