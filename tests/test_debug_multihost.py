"""Debug utilities, heartbeat, and preemption-resume loop tests."""

import numpy as np
import pytest

from feature_detector_fast_tpu.parallel import multihost
from feature_detector_fast_tpu.utils import debug


def test_nan_checking_trips():
    import jax
    import jax.numpy as jnp

    with debug.nan_checking():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # and is restored afterwards
    assert not jax.config.jax_debug_nans


def test_assert_finite():
    debug.assert_finite({"a": np.ones(3)}, "state")
    with pytest.raises(FloatingPointError):
        debug.assert_finite({"a": np.asarray([1.0, np.nan])}, "state")


def test_assert_replicas_identical():
    good = np.stack([np.arange(4)] * 3)
    debug.assert_replicas_identical(good)
    bad = good.copy()
    bad[2, 1] = 99
    with pytest.raises(AssertionError):
        debug.assert_replicas_identical(bad)


def test_dump_plane_hex():
    out = debug.dump_plane_hex(np.asarray([[1, 255], [16, 0]]))
    assert out.splitlines() == ["01 ff", "10 00"]
    # i32 planes (packed words / scores) align at 8 digits
    out = debug.dump_plane_hex(np.asarray([[1, -1], [0x2000, 0]]))
    assert out.splitlines() == ["00000001 ffffffff", "00002000 00000000"]


def test_healthcheck_all_devices():
    assert multihost.healthcheck() is True


def test_initialize_single_host_noop():
    assert multihost.initialize() == 0


def test_checkpointed_loop_resume(tmp_path, rng):
    loop = multihost.CheckpointedLoop(str(tmp_path / "ck"), every=2)
    state = {"w": rng.normal(0, 1, (4,)).astype(np.float32),
             "step": np.int32(0)}
    st, start = loop.resume(state)
    assert start == 0
    # run 5 steps, saving at steps 1 and 3
    for step in range(5):
        st = {"w": st["w"] + 1, "step": np.int32(step)}
        loop.maybe_save(step, st)
    st2, start2 = loop.resume(state)
    assert start2 == 4  # resumed after the step-3 save
    np.testing.assert_allclose(st2["w"], state["w"] + 4, rtol=1e-6)
