"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the data-parallel mesh paths
are exercised without TPU hardware (the standard JAX stand-in for a
pod, see SURVEY.md section 4 item 5). Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
