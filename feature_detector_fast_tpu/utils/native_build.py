"""Shared g++ build-and-cache helper for the framework's C++ components.

Both native modules (oracle/native.py's scalar oracle and
runtime/native.py's host decode loop) compile a single .cpp with g++ on
first use, cached in a sibling `_build/` directory keyed by the source
hash so edits rebuild and concurrent processes race safely (tmp file +
atomic os.replace).  This helper owns that scheme once.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
from typing import Sequence


def build_shared_lib(src: str, extra_flags: Sequence[str] = ()) -> str:
    """Compile ``src`` to a cached shared library; returns the .so path.

    The cache key is the source content hash, so stale artifacts are
    never loaded; the write is atomic (tmp + os.replace), so concurrent
    builders of the same digest are harmless.  Raises
    subprocess.CalledProcessError if g++ fails (callers decide whether
    that is fatal or gates a numpy fallback)."""
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    name = os.path.splitext(os.path.basename(src))[0]
    build_dir = os.path.join(os.path.dirname(src), os.pardir, "_build")
    so_path = os.path.join(build_dir, f"{name}_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(build_dir, exist_ok=True)
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             *extra_flags, src, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    return so_path
