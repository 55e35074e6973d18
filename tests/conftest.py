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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is XLA:CPU-compile-bound (GSPMD mesh programs on a 1-core
# box take minutes at full opt).  Same tricks as __graft_entry__'s
# dryrun: drop the backend optimization level (identical convergence,
# measured there) and persist compiled programs across test runs on
# this same machine (same-machine AOT reuse is safe; the cross-machine
# skew caveat in cli/common applies to shipping caches, not re-runs).
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/tpuqcd/xla-tests"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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
