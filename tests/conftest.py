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

# Persistent XLA compilation cache: the suite's cost is dominated by
# CPU compiles of the same programs run after run (round-5 latency pass:
# fast tier 15:13 cold). Keyed by HLO hash, so staleness is impossible by
# construction; the directory is gitignored. Threshold 0.5 s keeps the
# thousands of trivial compiles out of the cache.
_cache_dir = os.environ.get(
    "MTS_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # the env-var spelling reaches the SUBPROCESS tests too (multihost
    # workers, dryrun re-execs, shell drivers) — they import jax fresh and
    # would otherwise recompile cold every run
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
