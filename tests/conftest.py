"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised hermetically the way the driver does
(``xla_force_host_platform_device_count``); real-TPU benchmarking happens in
bench.py, not here.

Note: this environment registers a TPU backend from ``sitecustomize`` via
``jax.config.update("jax_platforms", "axon,cpu")``, which overrides the
``JAX_PLATFORMS`` env var — so the override must also go through
``jax.config``, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert jax.device_count() == 8


@pytest.fixture
def rng():
    return np.random.RandomState(0)
