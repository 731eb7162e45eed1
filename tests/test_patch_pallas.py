"""Patch-extraction kernel + MXU sampling vs the sparse references.

`describe_patched` (ops/patch_pallas.py + models/brief._sampling_matrix)
must be bit-identical to the sparse gather paths at every VALID slot —
oriented and unoriented — exactly like the dense kernel's contract
(tests/test_brief_pallas.py)."""

import numpy as np

import conftest
import pytest

from feature_detector_fast_tpu.models import brief
from feature_detector_fast_tpu.ops import patch_pallas


@pytest.mark.parametrize("shape", [(64, 128), (97, 130), (200, 300)])
def test_extract_patches(rng, shape):
    """Window k holds plane[y-15 : y+17, x-15 : x+113] at in-range spots."""
    h, w = shape
    plane = rng.integers(0, 6376, shape).astype(np.int32)
    k = 37  # deliberately not a multiple of the kernel's group size
    r = patch_pallas.PATCH // 2
    xy = np.stack([
        rng.integers(r, w - r - 1, k), rng.integers(r, h - r - 1, k)
    ], axis=-1).astype(np.int32)
    wins = np.asarray(
        patch_pallas.extract_patches(plane, xy, interpret=True))
    for i, (x, y) in enumerate(xy):
        rows = min(patch_pallas.WIN_H, h - (y - r))
        cols = min(patch_pallas.LANES, w - (x - r))
        want = plane[y - r : y - r + rows, x - r : x - r + cols]
        np.testing.assert_array_equal(wins[i, :rows, :cols], want)


def test_extract_patches_clamps_border(rng):
    """Out-of-range coordinates are clamped in-bounds, never crash."""
    plane = rng.integers(0, 6376, (64, 128)).astype(np.int32)
    xy = np.array([[0, 0], [127, 63], [-5, 200], [64, 32]], np.int32)
    wins = np.asarray(
        patch_pallas.extract_patches(plane, xy, interpret=True))
    assert wins.shape == (4, patch_pallas.WIN_H, patch_pallas.LANES)
    r = patch_pallas.PATCH // 2
    np.testing.assert_array_equal(
        wins[3, :31, :31], plane[32 - r : 32 + r + 1, 64 - r : 64 + r + 1])


@pytest.mark.parametrize("shape", [(64, 128), (97, 130), (200, 300)])
def test_extract_windows_fused(rng, shape):
    """Fused windows = blur5 | raw << RAW_SHIFT at every in-patch cell."""
    h, w = shape
    img = rng.integers(0, 256, shape, np.uint8)
    blur = np.asarray(brief.box_blur5(img))
    k = 21
    m = patch_pallas.PATCH // 2 + 2  # fused margin (patch + blur halo)
    xy = np.stack([
        rng.integers(m, w - m - 1, k), rng.integers(m, h - m - 1, k)
    ], axis=-1).astype(np.int32)
    wins = np.asarray(
        patch_pallas.extract_windows_fused(img, xy, interpret=True))
    r = patch_pallas.PATCH // 2
    n = patch_pallas.PATCH
    for i, (x, y) in enumerate(xy):
        want = (
            blur[y - r : y - r + n, x - r : x - r + n]
            | (img[y - r : y - r + n, x - r : x - r + n].astype(np.int32)
               << patch_pallas.RAW_SHIFT)
        )
        np.testing.assert_array_equal(wins[i, :n, :n], want)


@pytest.mark.parametrize("shape", [(64, 128), (200, 300)])
def test_extract_windows_fused_strip_fallback(rng, shape, monkeypatch):
    """The strip-DMA fallback kernel (images too big for VMEM residency)
    must produce the same windows as the resident path — every ordinary
    test image fits in VMEM, so force the fallback by shrinking the
    residency budget to zero."""
    h, w = shape
    img = rng.integers(0, 256, shape, np.uint8)
    k = 21
    m = patch_pallas.PATCH // 2 + 2
    xy = np.stack([
        rng.integers(m, w - m - 1, k), rng.integers(m, h - m - 1, k)
    ], axis=-1).astype(np.int32)
    want = np.asarray(
        patch_pallas.extract_windows_fused(img, xy, interpret=True))
    monkeypatch.setattr(patch_pallas, "_RESIDENT_BYTES_MAX", 0)
    got = np.asarray(
        patch_pallas.extract_windows_fused.__wrapped__(img, xy, 0, True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("oriented", [False, True])
@pytest.mark.parametrize("shape", [(64, 128), (97, 130), (200, 300)])
def test_patched_describe_matches_sparse(rng, shape, oriented):
    h, w = shape
    img = rng.integers(0, 256, shape, np.uint8)
    kps = conftest.fuzz_keypoints(rng, h, w, 64)
    if oriented:
        d_ref, v_ref = brief.describe_oriented(img, kps)
    else:
        d_ref, v_ref = brief.describe(img, kps)
    d_p, v_p = brief.describe_patched(img, kps, oriented, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_ref))
    v = np.asarray(v_ref)
    assert v.any(), "fuzz produced no valid keypoints"
    np.testing.assert_array_equal(np.asarray(d_p)[v], np.asarray(d_ref)[v])


@pytest.mark.parametrize("oriented", [False, True])
def test_block_sorted_feed_identical(rng, oriented):
    """The DMA-dedup feed order (sort_blocks=True) changes NOTHING: every
    descriptor row — valid or not — equals the unsorted feed's."""
    h, w = 200, 300
    img = rng.integers(0, 256, (h, w), np.uint8)
    for k in (1, 3, 37, 64):
        kps = conftest.fuzz_keypoints(rng, h, w, k)
        d_a, v_a = brief.describe_patched(
            img, kps, oriented, interpret=True, sort_blocks=False)
        d_b, v_b = brief.describe_patched(
            img, kps, oriented, interpret=True, sort_blocks=True)
        np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))
        np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))


def test_patched_describe_real_frontend(rng, reference_image):
    """detect + top-K + patched oriented describe on the committed frame
    equals the sparse steered path at valid slots."""
    from feature_detector_fast_tpu.api import _detect_dense_best
    from feature_detector_fast_tpu.config import NonmaxMode

    mask, score = _detect_dense_best(
        reference_image, 16, 9, NonmaxMode.SUM_ABSOLUTE)
    kps = brief.select_topk(mask, score, 128)
    d_ref, v_ref = brief.describe_oriented(reference_image, kps)
    d_p, v_p = brief.describe_patched(
        reference_image, kps, oriented=True, interpret=True)
    v = np.asarray(v_ref)
    assert v.sum() > 50
    np.testing.assert_array_equal(np.asarray(v_p), v)
    np.testing.assert_array_equal(np.asarray(d_p)[v], np.asarray(d_ref)[v])
