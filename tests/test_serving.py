"""Pipelined serving: results identical to the one-shot API, in order."""

import numpy as np
import pytest

from feature_detector_fast_tpu import Config, NonmaxMode, detect_arrays
from feature_detector_fast_tpu.serving import DetectorPipeline


def test_pipeline_matches_oneshot(rng):
    cfg = Config(16, 9, NonmaxMode.MAX_THRESHOLD)
    batches = [rng.integers(0, 256, (2, 40, 64), np.uint8) for _ in range(4)]

    pipe = DetectorPipeline(cfg, depth=2, max_supers=16)
    got = []
    for b in batches:
        pipe.submit(b)
        got.extend(list(pipe.ready()))
    got.extend(list(pipe.drain()))

    assert len(got) == len(batches)
    for batch, res in zip(batches, got):
        assert len(res) == batch.shape[0]
        for frame, kps in zip(batch, res):
            want = detect_arrays(frame, cfg)
            np.testing.assert_array_equal(kps, want)


def test_pipeline_input_validation():
    pipe = DetectorPipeline()
    with pytest.raises(ValueError):
        pipe.submit(np.zeros((40, 64), np.uint8))  # missing batch dim
    with pytest.raises(ValueError):
        pipe.submit(np.zeros((1, 40, 64), np.int32))  # wrong dtype
