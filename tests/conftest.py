"""Test configuration: run on CPU with 8 virtual devices (SURVEY.md §5).

The axon TPU platform force-registers itself regardless of JAX_PLATFORMS,
so plain env-var selection does not stick; we instead route everything to
the (always-present) CPU backend via jax_default_device.  XLA_FLAGS must
still be set before the first jax import to get the 8-device host
platform.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", CPUS[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def cpu_devices():
    return CPUS
