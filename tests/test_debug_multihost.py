"""Debug utilities, heartbeat, and preemption-resume loop tests."""

import numpy as np
import pytest

#: Fast-lane exclusion (VERDICT r3 #7): this module is SLAM/distributed-
#: heavy; `pytest -m 'not slow'` skips it for kernel iteration.
pytestmark = pytest.mark.slow

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


def test_healthcheck_timeout_returns_false_promptly():
    """A wedged peer blocks the heartbeat collective forever; the caller
    must get False within ~timeout_s, and subsequent healthchecks must not
    stack additional blocked threads (singleton in-flight collective)."""
    import threading
    import time

    release = threading.Event()

    def wedged():
        release.wait(30.0)  # simulates a psum blocked on a dead host
        return True

    t0 = time.perf_counter()
    ok = multihost.healthcheck(timeout_s=0.2, _collective=wedged)
    dt = time.perf_counter() - t0
    assert ok is False
    assert dt < 5.0, dt
    # the wedged collective is still in flight: immediate False, no new thread
    t0 = time.perf_counter()
    assert multihost.healthcheck(timeout_s=10.0, _collective=wedged) is False
    assert time.perf_counter() - t0 < 1.0
    n_threads = threading.active_count()
    for _ in range(5):
        assert multihost.healthcheck(timeout_s=10.0, _collective=wedged) is False
    assert threading.active_count() <= n_threads
    release.set()  # unblock; healthy heartbeat works again afterwards
    time.sleep(0.05)
    assert multihost.healthcheck(timeout_s=10.0) is True


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
