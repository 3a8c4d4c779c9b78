"""Test configuration: force an 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize imports jax at interpreter startup and
registers the (tunneled, high-latency) 'axon' TPU backend, so setting
JAX_PLATFORMS in os.environ here is too late — we must go through
jax.config.update before any backend is initialized.  Set
ORB_SLAM_TPU_TEST_ON_TPU=1 to run the suite on real hardware instead.
"""
import os

import jax

if os.environ.get("ORB_SLAM_TPU_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute integration runs")
