"""Pipeline-parallel front-end: equivalence with the sequential path.

The 3-stage detect -> describe -> match pipeline (parallel/pipeline.py)
must produce bit-identical keypoints, descriptors, and matches to running
the per-frame front-end sequentially — fill/drain bubbles and ppermute
hops are scheduling, not semantics.
"""

import numpy as np
import pytest

#: Fast-lane exclusion (VERDICT r3 #7): this module is SLAM/distributed-
#: heavy; `pytest -m 'not slow'` skips it for kernel iteration.
pytestmark = pytest.mark.slow

from feature_detector_fast_tpu.models import brief, match as matchlib
from feature_detector_fast_tpu.parallel import pipeline

K = 64
THRESHOLD = 16
COUNT = 9


def _frame_stream(rng, b=5, h=48, w=128) -> np.ndarray:
    """Shifted copies of one noisy textured frame — consecutive frames
    share structure, so real matches exist."""
    base = rng.integers(0, 256, (h, w + b), np.uint8)
    return np.stack([base[:, i : i + w] for i in range(b)])


def _sequential(frames):
    out = []
    prev = None
    for img in frames:
        kps, desc, dvalid = brief.detect_and_describe(
            img, THRESHOLD, COUNT, K
        )
        if prev is None:
            m = matchlib.Matches(
                np.full((K,), -1, np.int32),
                np.full((K,), brief.BITS + 1, np.int32),
            )
        else:
            m = matchlib.match(desc, dvalid, prev[0], prev[1])
        out.append((kps, desc, dvalid, m))
        prev = (desc, dvalid)
    return out


def test_pipeline_matches_sequential(rng):
    frames = _frame_stream(rng)
    mesh = pipeline.make_pipe_mesh()
    stream = pipeline.frontend_pipelined(
        frames, THRESHOLD, COUNT, K, mesh=mesh
    )
    ref = _sequential(frames)
    assert any(np.asarray(m.idx_b).max() >= 0 for *_, m in ref[1:]), (
        "test stream produced no matches — not exercising the matcher"
    )
    for i, (kps, desc, dvalid, m) in enumerate(ref):
        np.testing.assert_array_equal(stream.kp_xy[i], np.asarray(kps.xy))
        np.testing.assert_array_equal(
            stream.kp_score[i], np.asarray(kps.score)
        )
        np.testing.assert_array_equal(
            stream.kp_valid[i], np.asarray(kps.valid)
        )
        np.testing.assert_array_equal(stream.desc[i], np.asarray(desc))
        np.testing.assert_array_equal(stream.dvalid[i], np.asarray(dvalid))
        np.testing.assert_array_equal(
            stream.match_idx[i], np.asarray(m.idx_b)
        )
        np.testing.assert_array_equal(
            stream.match_dist[i], np.asarray(m.dist)
        )


def test_pipe_mesh_requires_three_devices():
    import jax

    with pytest.raises(ValueError):
        pipeline.make_pipe_mesh(jax.devices()[:2])


def test_pipeline_oriented_matches_sequential(rng):
    frames = _frame_stream(rng, b=4)
    mesh = pipeline.make_pipe_mesh()
    stream = pipeline.frontend_pipelined(
        frames, THRESHOLD, COUNT, K, mesh=mesh, oriented=True
    )
    prev = None
    for i, img in enumerate(frames):
        kps, desc, dvalid = brief.detect_and_describe(
            img, THRESHOLD, COUNT, K, oriented=True
        )
        np.testing.assert_array_equal(stream.desc[i], np.asarray(desc))
        np.testing.assert_array_equal(stream.dvalid[i], np.asarray(dvalid))
        if prev is not None:
            m = matchlib.match(desc, dvalid, prev[0], prev[1])
            np.testing.assert_array_equal(stream.match_idx[i], np.asarray(m.idx_b))
        prev = (desc, dvalid)
