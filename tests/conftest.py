"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the data-parallel mesh paths
are exercised without TPU hardware (the standard JAX stand-in for a
pod, see SURVEY.md section 4 item 5).

Note: this environment preloads jax via sitecustomize with
jax_platforms="axon,cpu" (the TPU tunnel), so plain env vars are
ignored — we must update jax.config before any backend initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process spawns, "
        "training runs)")


@pytest.fixture
def rng():
    return np.random.default_rng(1337)
