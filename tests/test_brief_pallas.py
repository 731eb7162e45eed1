"""Dense Pallas BRIEF vs the sparse sampling reference (interpret mode).

The dense kernel must produce bit-identical descriptors at every VALID
slot; invalid slots carry garbage in both paths and are masked by the
validity bit (models/brief.py::describe_dense)."""

import numpy as np

import conftest
import pytest

from feature_detector_fast_tpu.models import brief


@pytest.mark.parametrize("shape", [(64, 128), (97, 130), (200, 300)])
def test_dense_describe_matches_sparse(rng, shape):
    h, w = shape
    img = rng.integers(0, 256, shape, np.uint8)
    kps = conftest.fuzz_keypoints(rng, h, w, 64)
    d_sparse, v_sparse = brief.describe(img, kps)
    d_dense, v_dense = brief.describe_dense(img, kps, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_dense), np.asarray(v_sparse))
    v = np.asarray(v_sparse)
    assert v.any(), "fuzz produced no valid keypoints"
    np.testing.assert_array_equal(
        np.asarray(d_dense)[v], np.asarray(d_sparse)[v])


def test_dense_describe_real_frontend(rng, reference_image):
    """End-to-end: detect + select_topk + dense describe on the committed
    frame equals the sparse path at valid slots."""
    from feature_detector_fast_tpu.api import _detect_dense_best
    from feature_detector_fast_tpu.config import NonmaxMode

    mask, score = _detect_dense_best(
        reference_image, 16, 9, NonmaxMode.SUM_ABSOLUTE)
    kps = brief.select_topk(mask, score, 128)
    d_sparse, v_sparse = brief.describe(reference_image, kps)
    d_dense, v_dense = brief.describe_dense(reference_image, kps,
                                            interpret=True)
    v = np.asarray(v_sparse)
    assert v.sum() > 50
    np.testing.assert_array_equal(np.asarray(v_dense), v)
    np.testing.assert_array_equal(
        np.asarray(d_dense)[v], np.asarray(d_sparse)[v])
