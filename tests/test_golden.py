"""Golden regression pins on the committed reference frame.

Analogue of the reference's golden-hash check (tests/compare.rs:81-89):
keypoint counts and FNV-1a hashes for the five reference configs on
media/Screenshot315_torch_grey.png.  The Off/MaxThreshold entries are
independently confirmed against cv2's FAST in test_fast_dense.py; all five
are cross-checked against the scalar oracle on fuzz images.
"""

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


def test_reference_image_unchanged(reference_image):
    assert hash_image(reference_image) == GOLDEN_IMAGE_HASH


@pytest.mark.parametrize("config,count,kp_hash", GOLDEN, ids=str)
def test_golden_keypoints(reference_image, config, count, kp_hash):
    xy = detect_arrays(reference_image, config)
    assert len(xy) == count
    assert hash_keypoints(xy) == kp_hash
