"""Strongest-K selection: device-side score-threshold bisection.

Cross-checked against a numpy full sort of the dense score plane — the
thing the device path deliberately avoids computing."""

import jax
import numpy as np
import pytest

from feature_detector_fast_tpu import Config, NonmaxMode
from feature_detector_fast_tpu.api import detect_arrays, detect_strongest_arrays
from feature_detector_fast_tpu.ops import fast


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_arena():
    """Release the session's accumulated compiled executables before this
    module compiles the strongest-K bisection programs.  Full-suite runs
    segfaulted FLAKILY inside XLA:CPU's backend_compile_and_load right
    around these tests (~260 programs into the session; every module
    green in isolation, and serializing LLVM codegen did not help) — the
    signature of JIT code-memory pressure, which clearing the jit caches
    resets.  Costs a few re-compiles in later modules."""
    jax.clear_caches()
    yield


def _dense(img, cfg):
    mask, score = fast.detect_dense_jit(
        img, cfg.threshold, cfg.count, cfg.nonmax)
    return np.asarray(mask), np.asarray(score).astype(np.int64)


@pytest.mark.parametrize("mode", [NonmaxMode.MAX_THRESHOLD,
                                  NonmaxMode.SUM_ABSOLUTE])
@pytest.mark.parametrize("k", [1, 10, 50])
def test_strongest_matches_full_sort(rng, mode, k):
    cfg = Config(16, 9, mode)
    img = rng.integers(0, 256, (64, 128), np.uint8)
    mask, score = _dense(img, cfg)
    scores = np.sort(score[mask])[::-1]
    total = scores.size
    want = min(k, total)
    assert want > 0, "fuzz image produced no keypoints"
    t_expected = int(scores[want - 1])  # largest T with count(>=T) >= want

    xy, t_star = detect_strongest_arrays(img, cfg, k=k)
    assert t_star == t_expected
    # Exactly the keypoints with score >= T*, in row-major order.
    ys, xs = np.nonzero(mask & (score >= t_star))
    ref = np.stack([xs, ys], -1).astype(np.uint32)
    np.testing.assert_array_equal(xy, ref)
    assert xy.shape[0] >= want
    # Overshoot only by ties at the threshold: against the RAW detector
    # scores (the array_equal above would make a same-expression check a
    # tautology).
    assert xy.shape[0] == (scores >= t_expected).sum()


def test_strongest_k_exceeds_total(rng):
    cfg = Config(16, 9, NonmaxMode.MAX_THRESHOLD)
    img = rng.integers(0, 256, (40, 64), np.uint8)
    everything = detect_arrays(img, cfg)
    xy, t_star = detect_strongest_arrays(img, cfg, k=10 ** 6)
    np.testing.assert_array_equal(xy, everything)


def test_strongest_rejects_off_mode():
    with pytest.raises(ValueError):
        detect_strongest_arrays(np.zeros((32, 32), np.uint8),
                                Config(16, 9, NonmaxMode.OFF), k=5)
