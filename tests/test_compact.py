"""Hierarchical word compaction: parity with direct nonzero, order, caps."""

import numpy as np
import pytest

from feature_detector_fast_tpu.ops import compact


def reference_points(mask):
    ys, xs = np.nonzero(mask)
    return np.stack([xs, ys], axis=-1).astype(np.uint32)


@pytest.mark.parametrize("shape", [(8, 8), (26, 32), (33, 70), (200, 300)])
@pytest.mark.parametrize("density", [0.0, 0.01, 0.3, 1.0])
def test_word_compaction_roundtrip(rng, shape, density):
    mask = rng.random(shape) < density
    h, w = shape
    cap = -(-h * w // 32)  # no overflow possible
    widx, wbits, n, n_words = compact.compact_mask_words(mask, cap)
    assert int(n) == mask.sum()
    got = compact.expand_words_host(np.asarray(widx), np.asarray(wbits), int(n), w)
    np.testing.assert_array_equal(got, reference_points(mask))


def test_word_compaction_row_major_order(rng):
    mask = rng.random((40, 64)) < 0.1
    widx, wbits, n, n_words = compact.compact_mask_words(mask, 128)
    got = compact.expand_words_host(np.asarray(widx), np.asarray(wbits), int(n), 64)
    keys = [(int(y), int(x)) for x, y in got]
    assert keys == sorted(keys)


def test_word_compaction_overflow_detectable(rng):
    mask = np.ones((32, 32), bool)
    widx, wbits, n, n_words = compact.compact_mask_words(mask, 4)
    assert int(n_words) == 32 * 32 // 32
    assert int(n_words) > 4  # caller must retry


def test_packed_batch_roundtrip(rng):
    from feature_detector_fast_tpu import Config, NonmaxMode
    from feature_detector_fast_tpu.api import (
        _detect_compact_batch_packed,
        detect_arrays,
        unpack_batch_packed,
    )

    imgs = rng.integers(0, 256, (3, 26, 64), np.uint8)
    cap = 64
    packed = np.asarray(
        _detect_compact_batch_packed(imgs, 16, 9, NonmaxMode.MAX_THRESHOLD, cap)
    )
    kps = unpack_batch_packed(packed, cap, 64)
    for i in range(3):
        want = detect_arrays(imgs[i], Config(16, 9, NonmaxMode.MAX_THRESHOLD))
        np.testing.assert_array_equal(kps[i], want)


def test_padded_grid_compaction_matches_true_grid(rng):
    """The TPU path compacts on the kernel's lane-padded grid and decodes
    with effective (padded) width; validate that math on CPU via the
    interpret-mode padded kernel."""
    from feature_detector_fast_tpu.config import NonmaxMode
    from feature_detector_fast_tpu.ops import fast_pallas

    img = rng.integers(0, 256, (40, 200), np.uint8)  # W pads 200 -> 256
    mask_p, _ = fast_pallas.detect_dense_padded(
        img, 16, 9, NonmaxMode.MAX_THRESHOLD, True)
    wp = fast_pallas.padded_width(200)
    assert mask_p.shape[1] == wp
    widx, wbits, n, n_words = compact.compact_mask_words(mask_p, 256)
    got = compact.expand_words_host(np.asarray(widx), np.asarray(wbits),
                                    int(n), wp)
    from feature_detector_fast_tpu import Config, detect_arrays
    want = detect_arrays(img, Config(16, 9, NonmaxMode.MAX_THRESHOLD))
    np.testing.assert_array_equal(got, want)


def test_native_expand_matches_numpy(rng):
    """C++ host-runtime expansion must be bit-identical to the numpy path
    (order included), single-frame and threaded-batch."""
    from feature_detector_fast_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")

    w = 96
    batch, mw = 5, 40
    widx = np.sort(
        rng.choice(200, size=(batch, mw), replace=False).astype(np.int32), axis=1
    )
    wbits = rng.integers(0, 1 << 32, (batch, mw), dtype=np.uint32)
    wbits[:, -7:] = 0  # padding tail (expansion must skip zero words)
    counts = []
    for f in range(batch):
        ref = compact.expand_words_host(widx[f], wbits[f],
                                        int(np.unpackbits(wbits[f].view(np.uint8)).sum()), w)
        got = native.expand_words(widx[f], wbits[f], w)
        np.testing.assert_array_equal(got, ref)
        counts.append(len(ref))
    outs = native.expand_words_batch(widx, wbits, w, per_frame_cap=max(counts), threads=3)
    for f in range(batch):
        ref = compact.expand_words_host(widx[f], wbits[f], counts[f], w)
        np.testing.assert_array_equal(outs[f], ref)
