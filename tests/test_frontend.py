"""Front-end tests: top-K selection, BRIEF descriptors, MXU matching."""

import numpy as np
import pytest

from feature_detector_fast_tpu.models import brief, match


def test_select_topk_deterministic_order(rng):
    mask = rng.random((40, 64)) < 0.05
    score = rng.integers(1, 900, (40, 64)).astype(np.uint16)
    score = np.where(mask, score, 0)
    kps = brief.select_topk(np.asarray(mask), np.asarray(score), 16)
    got = [(int(s), int(x), int(y)) for (x, y), s, v in
           zip(np.asarray(kps.xy), np.asarray(kps.score), np.asarray(kps.valid)) if v]
    # reference: sort by (-score, row-major idx)
    ys, xs = np.nonzero(mask)
    items = sorted(
        [(-int(score[y, x]), int(y) * 64 + int(x), int(x), int(y)) for y, x in zip(ys, xs)]
    )[:16]
    want = [(-s, x, y) for s, _, x, y in items]
    assert got == want


def test_select_topk_underfull(rng):
    mask = np.zeros((32, 32), bool)
    mask[10, 10] = True
    score = np.where(mask, 7, 0).astype(np.uint16)
    kps = brief.select_topk(np.asarray(mask), np.asarray(score), 8)
    valid = np.asarray(kps.valid)
    assert valid.sum() == 1 and valid[0]
    assert tuple(np.asarray(kps.xy)[0]) == (10, 10)


def test_brief_border_invalidated(rng):
    img = rng.integers(0, 256, (64, 64), np.uint8)
    from feature_detector_fast_tpu.models.brief import Keypoints
    import jax.numpy as jnp

    xy = jnp.asarray([[5, 5], [32, 32], [60, 32]], jnp.int32)
    kps = Keypoints(xy, jnp.ones(3, jnp.int32), jnp.ones(3, bool))
    desc, valid = brief.describe(img, kps)
    assert list(np.asarray(valid)) == [False, True, False]


def test_brief_descriptor_invariance_to_shift(rng):
    """Same patch content at a different location -> identical descriptor."""
    patch = rng.integers(0, 256, (41, 41), np.uint8)
    img1 = np.full((96, 96), 127, np.uint8)
    img2 = np.full((96, 96), 127, np.uint8)
    img1[20:61, 20:61] = patch
    img2[30:71, 25:66] = patch
    from feature_detector_fast_tpu.models.brief import Keypoints
    import jax.numpy as jnp

    k1 = Keypoints(jnp.asarray([[40, 40]], jnp.int32), jnp.ones(1, jnp.int32),
                   jnp.ones(1, bool))
    k2 = Keypoints(jnp.asarray([[45, 50]], jnp.int32), jnp.ones(1, jnp.int32),
                   jnp.ones(1, bool))
    d1, v1 = brief.describe(img1, k1)
    d2, v2 = brief.describe(img2, k2)
    assert bool(v1[0]) and bool(v2[0])
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_hamming_matrix_matches_popcount(rng):
    ka, kb = 17, 23
    da = rng.integers(0, 2**32, (ka, brief.WORDS), dtype=np.uint32)
    db = rng.integers(0, 2**32, (kb, brief.WORDS), dtype=np.uint32)
    va = np.ones(ka, bool)
    vb = np.ones(kb, bool)
    got = np.asarray(match.hamming_matrix(da, va, db, vb))
    want = np.zeros((ka, kb), np.int32)
    for i in range(ka):
        for j in range(kb):
            want[i, j] = sum(bin(int(da[i, k]) ^ int(db[j, k])).count("1")
                             for k in range(brief.WORDS))
    np.testing.assert_array_equal(got, want)


def test_match_identity(rng):
    """Matching a descriptor set against itself is the identity map."""
    k = 32
    desc = rng.integers(0, 2**32, (k, brief.WORDS), dtype=np.uint32)
    valid = np.ones(k, bool)
    m = match.match(desc, valid, desc, valid)
    idx = np.asarray(m.idx_b)
    assert (idx == np.arange(k)).all()
    assert (np.asarray(m.dist) == 0).all()


def test_match_end_to_end_shifted_frame(reference_image):
    """Detect+describe on a frame and a shifted copy; matches must
    overwhelmingly agree with the known shift."""
    import jax.numpy as jnp

    img1 = reference_image
    dx, dy = 7, 4
    img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)
    kps1, d1, v1 = brief.detect_and_describe(jnp.asarray(img1), 16, 9, 256)
    kps2, d2, v2 = brief.detect_and_describe(jnp.asarray(img2), 16, 9, 256)
    m = match.match(d1, v1, d2, v2)
    pa, pb, ok = match.match_points(kps1.xy, kps2.xy, m)
    pa, pb, ok = np.asarray(pa), np.asarray(pb), np.asarray(ok)
    assert ok.sum() >= 50
    delta = pb[ok] - pa[ok]
    good = ((delta[:, 0] == dx) & (delta[:, 1] == dy)).mean()
    assert good > 0.9
