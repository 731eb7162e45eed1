"""Spatial (row-tile) sharded detection vs the single-device detector.

Bit-exactness of parallel.spatial.detect_rows_sharded on the 8-device
CPU mesh: halo exchange + global-coordinate border quirks must reproduce
`ops.fast.detect_dense` exactly for every mode (SURVEY.md §5.7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feature_detector_fast_tpu.config import NonmaxMode
from feature_detector_fast_tpu.ops import fast
from feature_detector_fast_tpu.parallel import mesh as meshlib, spatial


@pytest.mark.parametrize(
    "mode", [NonmaxMode.OFF, NonmaxMode.MAX_THRESHOLD, NonmaxMode.SUM_ABSOLUTE]
)
def test_sharded_matches_dense_reference_image(reference_image, mode):
    img = jnp.asarray(reference_image)
    mesh = meshlib.make_mesh()
    mask_s, score_s = spatial.detect_rows_sharded(
        img, 16, 9, mode, mesh=mesh, interpret=True
    )
    mask_d, score_d = fast.detect_dense(img, 16, 9, mode)
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_d))
    np.testing.assert_array_equal(np.asarray(score_s), np.asarray(score_d))


@pytest.mark.parametrize("count", [9, 12, 16])
def test_sharded_matches_dense_random(rng, count):
    """Taller-than-one-tile-per-shard random image (each shard gets 2
    tiles), exercising internal halo exchange on every seam."""
    img = jnp.asarray(rng.integers(0, 256, (1024, 260), np.uint8))
    mesh = meshlib.make_mesh()
    mask_s, score_s = spatial.detect_rows_sharded(
        img, 12, count, NonmaxMode.SUM_ABSOLUTE, mesh=mesh, interpret=True
    )
    mask_d, score_d = fast.detect_dense(img, 12, count,
                                        NonmaxMode.SUM_ABSOLUTE)
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_d))
    np.testing.assert_array_equal(np.asarray(score_s), np.asarray(score_d))


def test_sharded_garbage_halo_is_masked(rng):
    """Global top/bottom shards receive wrapped (meaningless) halo slabs;
    the result must still match — i.e. everything such rows can influence
    is masked as non-interior."""
    # image exactly n*TILE_H tall: no padding rows isolating the wrap
    img = jnp.asarray(rng.integers(0, 256, (512, 131), np.uint8))
    mesh = meshlib.make_mesh()
    mask_s, _ = spatial.detect_rows_sharded(
        img, 16, 9, NonmaxMode.OFF, mesh=mesh, interpret=True
    )
    mask_d, _ = fast.detect_dense(img, 16, 9, NonmaxMode.OFF)
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_d))


@pytest.mark.parametrize(
    "mode", [NonmaxMode.OFF, NonmaxMode.MAX_THRESHOLD, NonmaxMode.SUM_ABSOLUTE]
)
def test_sharded_keypoint_list_matches_api(reference_image, mode):
    """The sharded path must deliver the reference's keypoint-LIST
    contract (lib.rs:56-64): per-shard packed-words emission + per-shard
    superword compaction + order-preserving stitch, bit-identical —
    values and row-major order — to the single-device api.detect_arrays
    (VERDICT r2 #5)."""
    from feature_detector_fast_tpu import Config, api

    img = jnp.asarray(reference_image)
    mesh = meshlib.make_mesh()
    xy_s = spatial.detect_arrays_rows_sharded(
        img, 16, 9, mode, mesh=mesh, interpret=True
    )
    xy_d = api.detect_arrays(np.asarray(reference_image),
                             Config(16, 9, mode))
    np.testing.assert_array_equal(np.asarray(xy_s), np.asarray(xy_d))


def test_sharded_keypoint_list_overflow_retry(rng):
    """A 1-superword-per-shard starting cap must grow (never dropping
    keypoints) until the densest shard fits."""
    from feature_detector_fast_tpu import Config, api

    img = jnp.asarray(rng.integers(0, 256, (512, 131), np.uint8))
    mesh = meshlib.make_mesh()
    xy_s = spatial.detect_arrays_rows_sharded(
        img, 16, 9, NonmaxMode.OFF, mesh=mesh, max_supers_local=1,
        interpret=True,
    )
    xy_d = api.detect_arrays(np.asarray(img), Config(16, 9, NonmaxMode.OFF))
    assert len(xy_d) > 8  # the tiny cap genuinely overflowed
    np.testing.assert_array_equal(np.asarray(xy_s), np.asarray(xy_d))


def test_sharded_keypoint_list_wide_8k(rng):
    """Width > 4096: the packed-words kernel grows its word-lane block in
    128-word steps up to 8192 px (round 5, VERDICT r4 #2 — the fixed
    128-lane block made docs/DISTRIBUTED.md's 8K keypoint-list claim
    false).  An 8192-px-wide frame must return bit-exact keypoints via
    the documented row-sharded keypoint-list path."""
    from feature_detector_fast_tpu import Config, api
    from feature_detector_fast_tpu.ops import fast_pallas

    assert fast_pallas.words_supported(8192)
    assert not fast_pallas.words_supported(8193)
    img = jnp.asarray(rng.integers(0, 256, (96, 8192), np.uint8))
    mesh = meshlib.make_mesh()
    xy_s = spatial.detect_arrays_rows_sharded(
        img, 16, 9, NonmaxMode.OFF, mesh=mesh, interpret=True
    )
    xy_d = api.detect_arrays(np.asarray(img), Config(16, 9, NonmaxMode.OFF))
    assert len(xy_d) > 100
    np.testing.assert_array_equal(np.asarray(xy_s), np.asarray(xy_d))


def test_packed_words_wide_nonmultiple_lanes(rng):
    """A width whose word count is not a 128-multiple (5000 px -> 160
    words -> 256 lanes) must emit the identical flat word stream as
    dense-detect + pack (single-device detect_words_padded path)."""
    from feature_detector_fast_tpu.ops import compact, fast_pallas

    img = rng.integers(0, 256, (40, 5000), np.uint8)
    mask, _ = fast_pallas.detect_dense_padded(
        img, 16, 9, NonmaxMode.OFF, True)
    ref_bits, ref_n = compact.pack_mask_words(mask)
    words = fast_pallas.detect_words_padded(img, 16, 9, NonmaxMode.OFF, True)
    wpw = fast_pallas.padded_width(img.shape[1]) // 32
    assert words.shape[1] == 256
    got = np.asarray(words)[:, :wpw].reshape(-1)
    np.testing.assert_array_equal(got, np.asarray(ref_bits))
    assert not np.asarray(words)[:, wpw:].any()
