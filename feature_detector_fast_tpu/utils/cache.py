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


def _machine_tag() -> str:
    """Short fingerprint of the host CPU's ISA feature set.  XLA:CPU
    persists AOT-compiled executables that embed the compile machine's
    vector ISA; this sandbox migrates between VM flavors, and loading an
    entry compiled on an avx512/amx host on a narrower one SEGFAULTS
    mid-test ("Machine type used for XLA:CPU compilation doesn't match
    ... could lead to SIGILL", then a real one — round 5).  Keying the
    CPU cache by the feature flags isolates each machine's entries."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


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
    try:
        # CPU-backend entries are machine-ISA-specific (see _machine_tag);
        # TPU entries are compiled remotely and host-independent, so they
        # keep the shared top-level directory (first compiles through the
        # relay cost 20-120 s — that cache is the expensive one).
        if jax.default_backend() == "cpu":
            path = os.path.join(path, f"cpu-{_machine_tag()}")
    except Exception:
        pass
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags: harmless
