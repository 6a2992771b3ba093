"""Test harness: run everything on CPU with 8 virtual devices.

This is the standard JAX fake-backend pattern for testing multi-chip
sharding without hardware (SURVEY.md section 4d).  Must run before jax
initializes, hence module-level os.environ in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env ships JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
