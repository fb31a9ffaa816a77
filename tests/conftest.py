"""Test harness: force CPU with 8 virtual devices (distributed tests run on a
host-device mesh, per the rebuild test strategy — SURVEY.md §4).

Note: this environment preloads a TPU PJRT plugin via sitecustomize, so
JAX_PLATFORMS from the environment is not enough — we must also flip
``jax.config`` before any backend gets used.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
