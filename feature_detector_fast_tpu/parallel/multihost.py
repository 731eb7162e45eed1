"""Multi-host orchestration: initialization, failure detection, and
preemption-safe execution (SURVEY.md §5.3/§5.8 — new scope).

On TPU pods there is no NCCL/MPI-style transport to manage: XLA emits
collectives over ICI/DCN once `jax.distributed.initialize` has formed the
process group.  What the framework owns is:

  * `initialize()` — idempotent process-group setup from standard TPU env
    (no-op single-host),
  * `healthcheck()` — an all-reduce heartbeat across hosts; a hung or
    dead peer surfaces as a timeout here, the practical failure detector
    on pods,
  * `CheckpointedLoop` — preemption-safe iteration: periodic orbax saves
    plus resume-from-latest, the standard recovery pattern for preemptible
    TPU fleets.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

from ..utils import checkpoint as ckpt


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Form the multi-host process group (idempotent).  With no arguments
    JAX auto-detects TPU pod environments; on a single host this is a
    no-op.  Returns this host's process index."""
    global _initialized
    import jax

    if not _initialized and (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_index()


def healthcheck(timeout_s: float = 60.0) -> bool:
    """Cross-host heartbeat: a tiny psum across all devices of all hosts.
    Returns True iff it completes within the timeout (single-host: always
    a fast local reduce).  A False/timeout indicates a lost or wedged
    peer — callers should checkpoint and abort for the scheduler to
    restart the slice."""
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    try:
        devs = jax.devices()
        x = jax.device_put_replicated(jnp.ones((), jnp.int32), devs)
        total = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
        ok = int(np.asarray(total)[0]) == len(devs)
        return ok and (time.monotonic() - t0) <= timeout_s
    except Exception:
        return False


class CheckpointedLoop:
    """Preemption-safe iteration driver.

    Wraps a step function with resume-from-latest and periodic saves:

        loop = CheckpointedLoop(dir, every=50)
        state, start = loop.resume(init_state)
        for step in range(start, n_steps):
            state = step_fn(state)
            loop.maybe_save(step, state)
    """

    def __init__(self, directory: str, every: int = 100):
        self.directory = directory
        self.every = int(every)

    def resume(self, init_state: Dict[str, Any]):
        """Returns (state, next_step): restored from the latest checkpoint
        if one exists, else (init_state, 0)."""
        step = ckpt.latest_step(self.directory)
        if step is None:
            return init_state, 0
        template = ckpt._arrayify(init_state)
        state = ckpt.restore_state(self.directory, step, template)
        return state, step + 1

    def maybe_save(self, step: int, state: Dict[str, Any]) -> bool:
        """Save every `every` steps; process 0 writes (single-writer)."""
        import jax

        if (step + 1) % self.every != 0:
            return False
        if jax.process_index() == 0:
            ckpt.save_state(self.directory, step, state)
        return True
