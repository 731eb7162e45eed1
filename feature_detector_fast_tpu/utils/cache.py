"""Persistent XLA compilation cache setup.

First-compile of TPU programs through a remote-attached runtime costs
20-120 s; the persistent cache makes every entry point (CLI, bench,
tools, tests on TPU) pay it once per (program, shape, config) ever.
Call `enable()` before the first jit execution; it is idempotent.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "feature_detector_fast_tpu", "xla"
)


def enable(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("FDF_CPU"):
        # Opt-out of the TPU attach for tools/benches (the sandbox's
        # sitecustomize pins JAX_PLATFORMS to the remote TPU, so a plain
        # env var cannot; jax.config wins before first backend use).
        # Lets CPU smoke runs of demos/benches coexist with a live TPU
        # job — two attached TPU processes contend on the relay and both
        # crawl (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    path = cache_dir or os.environ.get("FDF_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags: harmless
