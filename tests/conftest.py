"""Test harness: run everything on CPU with 8 virtual devices.

The standard JAX fake-backend pattern for testing multi-chip sharding
without hardware (SURVEY.md section 4d).  NOTE: this environment ships the
'axon' TPU plugin; once it registers, `xla_force_host_platform_device_count`
is ignored, so we must force the platform via jax.config BEFORE any backend
initialization (conftest imports before test modules).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
