"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding layers are tested the standard JAX way — a spoofed
8-device host-platform mesh (SURVEY.md §4).  Must run before jax imports.
"""

import os

# The sandbox's sitecustomize pins JAX_PLATFORMS to the TPU backend at
# interpreter boot, so plain env vars are overridden; jax.config wins as
# long as it runs before first backend use.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def reference_image() -> np.ndarray:
    """The committed 300x200 gray frame from the reference repo
    (media/Screenshot315_torch_grey.png, tests/compare.rs:24-25)."""
    from feature_detector_fast_tpu.utils.image import load_luma8

    return load_luma8(os.path.join(os.path.dirname(__file__), "..", "media",
                                   "Screenshot315_torch_grey.png"))


@pytest.fixture()
def rng() -> np.random.Generator:
    """Fresh deterministic stream per test — results must not depend on
    which other tests ran first."""
    return np.random.default_rng(0x5EED)
