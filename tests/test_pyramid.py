"""Pyramid detection: downsampling semantics and cross-scale matching."""

import numpy as np
import pytest

#: Fast-lane exclusion (VERDICT r3 #7): this module is SLAM/distributed-
#: heavy; `pytest -m 'not slow'` skips it for kernel iteration.
pytestmark = pytest.mark.slow

import jax.numpy as jnp

from feature_detector_fast_tpu.models import brief, match, pyramid


def test_downsample2_exact(rng):
    img = rng.integers(0, 256, (6, 8), np.uint8)
    got = np.asarray(pyramid.downsample2(jnp.asarray(img)))
    for y in range(3):
        for x in range(4):
            s = int(img[2*y:2*y+2, 2*x:2*x+2].astype(np.int64).sum())
            assert got[y, x] == (s + 2) // 4


def test_build_pyramid_levels(rng):
    img = rng.integers(0, 256, (256, 320), np.uint8)
    lv = pyramid.build_pyramid(jnp.asarray(img), 4)
    assert [l.shape for l in lv] == [(256, 320), (128, 160), (64, 80)]
    # level 3 would be (32, 40) < descriptor-safe minimum -> dropped


def test_multiscale_features_structure(reference_image):
    f = pyramid.detect_and_describe_multiscale(
        jnp.asarray(reference_image), 16, 9, k_per_level=64, n_levels=3)
    k = f.xy0.shape[0]
    assert k == f.desc.shape[0] == f.level.shape[0]
    lvls = np.asarray(f.level)[np.asarray(f.valid)]
    assert (np.unique(lvls) >= 0).all()
    # level-0 coordinates of level-l slots are scaled
    xy = np.asarray(f.xy)
    xy0 = np.asarray(f.xy0)
    lv = np.asarray(f.level)
    np.testing.assert_array_equal(xy0, xy * (1 << lv)[:, None])


def test_cross_scale_matching(reference_image):
    """A 2x-downscaled frame matches the original's level-1 features: the
    pyramid makes the front-end scale invariant."""
    img = reference_image
    small = np.asarray(pyramid.downsample2(jnp.asarray(img)))

    f_big = pyramid.detect_and_describe_multiscale(
        jnp.asarray(img), 16, 9, k_per_level=128, n_levels=2)
    kps_s, d_s, v_s = brief.detect_and_describe(jnp.asarray(small), 16, 9, 128)

    m = match.match(d_s, v_s, f_big.desc, f_big.valid)
    ok = np.asarray(m.idx_b) >= 0
    assert ok.sum() >= 20
    # matched big-image slots should be predominantly level-1 and at ~2x
    # the small-image coordinates
    sel = np.asarray(m.idx_b)[ok]
    lv = np.asarray(f_big.level)[sel]
    assert (lv == 1).mean() > 0.7
    small_xy = np.asarray(kps_s.xy)[ok]
    big_xy0 = np.asarray(f_big.xy0)[sel]
    lv1 = lv == 1
    err = np.abs(big_xy0[lv1] - small_xy[lv1] * 2)
    assert np.median(err) <= 1.0
