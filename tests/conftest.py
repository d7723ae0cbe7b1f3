"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests emulate an
8-device mesh on host CPU exactly as the driver's dryrun does.
Must run before jax is imported anywhere.
"""
import os

# Note: the environment pre-sets JAX_PLATFORMS=axon and a sitecustomize hook
# registers the TPU backend in every process, so the env var must be
# overridden (not setdefault) AND jax.config updated after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
