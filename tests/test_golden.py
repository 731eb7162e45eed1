"""Golden regression pins on the committed reference frame.

Analogue of the reference's golden-hash check (tests/compare.rs:81-89):
keypoint counts and FNV-1a hashes for the five reference configs on
media/Screenshot315_torch_grey.png.  The Off/MaxThreshold entries are
independently confirmed against cv2's FAST in test_fast_dense.py; all five
are cross-checked against the scalar oracle on fuzz images.
"""

import os

import pytest

from feature_detector_fast_tpu import Config, NonmaxMode, detect_arrays
from feature_detector_fast_tpu.utils.hashing import hash_image, hash_keypoints

GOLDEN_IMAGE_HASH = 0x509FCFE2E529AFCE

GOLDEN = [
    (Config(16, 9, NonmaxMode.OFF), 309, 0x9C9E48257E77AB23),
    (Config(16, 9, NonmaxMode.MAX_THRESHOLD), 131, 0x0808251D63604630),
    (Config(16, 9, NonmaxMode.SUM_ABSOLUTE), 135, 0x826FDD2651736590),
    (Config(16, 12, NonmaxMode.SUM_ABSOLUTE), 80, 0x540D6B6CC0F4678C),
    (Config(32, 12, NonmaxMode.SUM_ABSOLUTE), 16, 0xA03E6E07AC690795),
]

# Native-1080p goldens on the committed natural-statistics benchmark frame
# (media/golden_1080p.png, rendered by tools/make_golden_1080p.py — single
# seamless frame, NO tiling; tile seams have artificial corner statistics).
# This is the reference's true golden scale (its private 1080p screenshot,
# tests/compare.rs:81-89, 23184/7646/8307 keypoints README.md:58-65).
# Off and MaxThreshold are cv2-verified in test_fast_dense.py; keypoint
# density (24130 OFF) matches the reference frame's (23184).
GOLDEN_1080P_IMAGE_HASH = 0x49E1A4ECF6FAE94F

GOLDEN_1080P = [
    (Config(16, 9, NonmaxMode.OFF), 24130, 0xE063E6EF93A53E63),
    (Config(16, 9, NonmaxMode.MAX_THRESHOLD), 4457, 0xB11E93BC5D76998C),
    (Config(16, 9, NonmaxMode.SUM_ABSOLUTE), 6469, 0x4D1BE1E2206B3ADA),
]


@pytest.fixture(scope="session")
def golden_1080p():
    from feature_detector_fast_tpu.utils.image import load_luma8

    return load_luma8(os.path.join(os.path.dirname(__file__), os.pardir,
                                   "media", "golden_1080p.png"))


def test_reference_image_unchanged(reference_image):
    assert hash_image(reference_image) == GOLDEN_IMAGE_HASH


@pytest.mark.parametrize("config,count,kp_hash", GOLDEN, ids=str)
def test_golden_keypoints(reference_image, config, count, kp_hash):
    xy = detect_arrays(reference_image, config)
    assert len(xy) == count
    assert hash_keypoints(xy) == kp_hash


def test_golden_1080p_image_unchanged(golden_1080p):
    assert golden_1080p.shape == (1080, 1920)
    assert hash_image(golden_1080p) == GOLDEN_1080P_IMAGE_HASH


@pytest.mark.parametrize("config,count,kp_hash", GOLDEN_1080P, ids=str)
def test_golden_1080p_keypoints(golden_1080p, config, count, kp_hash):
    xy = detect_arrays(golden_1080p, config)
    assert len(xy) == count
    assert hash_keypoints(xy) == kp_hash
