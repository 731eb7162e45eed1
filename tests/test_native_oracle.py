"""Native C++ oracle: build, and three-way differential vs naive/cv2/dense."""

import numpy as np
import pytest

from feature_detector_fast_tpu import Config, NonmaxMode, detect_arrays
from feature_detector_fast_tpu.oracle import naive, native


CONFIGS = [
    Config(16, 9, NonmaxMode.OFF),
    Config(16, 9, NonmaxMode.MAX_THRESHOLD),
    Config(16, 9, NonmaxMode.SUM_ABSOLUTE),
    Config(10, 11, NonmaxMode.MAX_THRESHOLD),
    Config(32, 12, NonmaxMode.SUM_ABSOLUTE),
    Config(5, 16, NonmaxMode.MAX_THRESHOLD),
]


@pytest.mark.parametrize("config", CONFIGS, ids=str)
def test_native_matches_naive_random(rng, config):
    for _ in range(2):
        img = rng.integers(0, 256, (26, 32), np.uint8)
        got = [(int(x), int(y)) for x, y in native.detect_arrays(img, config)]
        want = [(p.x, p.y) for p in naive.detector(img, config)]
        assert got == want


@pytest.mark.parametrize("config", CONFIGS, ids=str)
def test_native_matches_dense_reference_image(reference_image, config):
    """Full-frame differential: the XLA dense path vs the native scalar
    oracle on the real 300x200 frame (the tier-3 compare.rs analogue, but
    native-speed so it covers every config)."""
    got = [(int(x), int(y)) for x, y in native.detect_arrays(reference_image, config)]
    want = [(int(x), int(y)) for x, y in detect_arrays(reference_image, config)]
    assert got == want


def test_native_score_probes_match_naive(rng):
    img = rng.integers(0, 256, (26, 32), np.uint8)
    for x in range(4, 28, 3):
        for y in range(4, 22, 3):
            assert native.score_max_threshold(img, (x, y), 9) == \
                naive.score_max_threshold(img, (x, y), 9)
            assert native.score_sum_abs(img, (x, y), 16) == \
                naive.score_sum_abs(img, (x, y), 16)

    # direct keypoint parity probe
    kp_naive = {(p.x, p.y) for p in naive.detect(img, 16, 9)}
    for x in range(3, 29):
        for y in range(3, 23):
            assert native.is_keypoint(img, (x, y), 16, 9) == ((x, y) in kp_naive)


def test_native_matches_api_full_1080p():
    """Large-scale differential: the full API pipeline vs the native C++
    oracle on a tiled 1080p frame (the benchmark image)."""
    import sys
    sys.path.insert(0, ".")
    from bench import build_1080p_frame

    img = build_1080p_frame()
    for config in (Config(16, 9, NonmaxMode.OFF),
                   Config(16, 9, NonmaxMode.MAX_THRESHOLD)):
        got = detect_arrays(img, config)
        want = native.detect_arrays(img, config)
        np.testing.assert_array_equal(got, want)
