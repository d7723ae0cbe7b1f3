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
# fast tier 15:13 cold -> 5:50 warm). Keyed by HLO hash, so staleness is
# impossible by construction; the directory is gitignored. Threshold 0.5 s
# keeps the thousands of trivial compiles out of the cache.
#
# SCOPE: the cache is UNSAFE in any process that also executes
# cross-device collective programs on this image's XLA:CPU: once an AOT
# entry has been loaded, a later sharded program (even freshly compiled)
# can hang at a collective rendezvous ("Termination timeout for all
# reduce ... of 40 seconds exceeded", rendezvous.cc check-fail ->
# SIGABRT). Measured round 5: deterministic with warm test_parallel,
# reproducible with device_epochs(warm)->test_parallel, and FLAKY in
# mixed orders — so per-module scoping is not safe either. Policy: if the
# collected run contains ANY multi-device module, the cache is disabled
# for the WHOLE run (pytest_collection_modifyitems below). The fast tier
# (-m "not slow") contains no multi-device tests and keeps the warm-cache
# speedup; the full gate runs uncached. The env-var spelling is never
# exported, so subprocess tests (dryrun re-execs, multihost workers — all
# multi-device) cannot inherit it.
_cache_dir = os.environ.get(
    "MTS_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

_MULTIDEVICE_MODULES = frozenset({
    "test_parallel",
    "test_sequence_parallel",
    "test_pipeline_parallel",
    "test_expert_parallel",
    "test_predict_sharded",
    "test_trainer_parallel_modes",
    "test_multihost",
    "test_graft_entry",
    # test_tpu_smoke is NOT listed: it is env-gated (MTS_TPU_TESTS=1) onto
    # the axon TPU backend, not XLA:CPU, and its always-collected skip
    # stub must not cost fast-tier runs the cache
})

# modules that are mostly single-device but carry a few collective tests
# (all slow-marked): trigger on the specific items so runs of the rest of
# the module keep the cache. test_grid_trainer's lockstep-grid tests are
# pure single-device vmap programs (GridTrainer without a mesh, and the
# -pg CLI parity pair) — only the config-axis mesh-sharding test runs
# collectives.
_MULTIDEVICE_ITEM_PREFIXES = {
    "test_trainer_runtime": ("test_mesh_fit",),
    "test_grid_trainer": ("test_grid_mesh_config_sharding",),
}

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"


def _is_multi(item):
    fname = item.nodeid.split("::", 1)[0]
    mod = os.path.splitext(os.path.basename(fname))[0]
    if mod in _MULTIDEVICE_MODULES:
        return True
    prefixes = _MULTIDEVICE_ITEM_PREFIXES.get(mod, ())
    return any(item.name.startswith(p) for p in prefixes)


def pytest_collection_modifyitems(config, items):
    """Tag collective tests with the `multidevice` marker (so a gate can
    select `-m "slow and not multidevice"` and keep the compile cache for
    the single-device slow suites — see scripts/gate.sh), and disable the
    persistent compile cache for the WHOLE run when any multi-device test
    was actually SELECTED. Marker application must run BEFORE pytest's own
    deselection prunes `items`; the cache decision must run AFTER — so the
    cache check runs in pytest_collection_finish below."""
    for item in items:
        if _is_multi(item):
            item.add_marker(pytest.mark.multidevice)


def pytest_collection_finish(session):
    """Cache decision on the post-deselection item set (collection_finish
    runs after every modifyitems hook, so a tier that merely
    collected-then-deselected the collective suites keeps the cache). The
    check honors the MARKER, not just the conftest lists: a new collective
    test anywhere can (and should) declare @pytest.mark.multidevice at the
    test site and get the same cache protection."""
    if _cache_dir == "0":
        return

    if any(i.get_closest_marker("multidevice") is not None
           for i in session.items):
        jax.config.update("jax_compilation_cache_dir", None)
        print(
            "[conftest] multi-device tests collected -> persistent compile "
            "cache disabled for this run (XLA:CPU AOT + collectives is "
            "unsafe in one process)"
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
