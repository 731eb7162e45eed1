"""Config canonicalization/validation (reference: lib.rs:40-52 fields +
fast_simd.rs:302-305 count assertion).  Fields are jit-static keys, so
every accepted value must canonicalize to one exact representation."""

import pytest

from feature_detector_fast_tpu import Config, NonmaxMode


def test_defaults():
    c = Config()
    assert (c.threshold, c.count, c.nonmax) == (16, 9, NonmaxMode.OFF)


def test_canonicalizes_integral_values():
    import numpy as np

    c = Config(threshold=np.int64(16), count=np.uint8(12))
    assert c.threshold == 16 and type(c.threshold) is int
    assert c.count == 12 and type(c.count) is int
    # exact integral floats canonicalize too (lossless)
    assert Config(threshold=16.0).threshold == 16


@pytest.mark.parametrize("bad", [16.9, "16", True, False, float("inf"),
                                 float("nan"), None, [16]])
def test_rejects_lossy_or_nonint(bad):
    with pytest.raises(TypeError):
        Config(threshold=bad)
    if bad not in (True, False):  # count shares the same canonicalizer
        with pytest.raises(TypeError):
            Config(count=bad)


@pytest.mark.parametrize("t", [-1, 256])
def test_threshold_range(t):
    with pytest.raises(ValueError):
        Config(threshold=t)


@pytest.mark.parametrize("n", [8, 17])
def test_count_range(n):
    with pytest.raises(ValueError):
        Config(count=n)


def test_nonmax_type_checked():
    with pytest.raises(TypeError):
        Config(nonmax="off")


def test_parse_mode():
    assert NonmaxMode.parse("sum_absolute") is NonmaxMode.SUM_ABSOLUTE
    with pytest.raises(ValueError):
        NonmaxMode.parse("bogus")


def test_hashable_static_key():
    assert Config(16, 9) == Config(16.0, 9)
    assert hash(Config(16, 9)) == hash(Config(threshold=16, count=9))
