"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 failure mode (MULTICHIP_r01.json): the driver called
dryrun_multichip(8) from a process whose JAX backend was ALREADY initialized
on the single-chip TPU, so the in-process CPU flip was a no-op and the
device-count assertion fired. The fix re-execs the dryrun in a scrubbed
subprocess; these tests simulate the pre-initialized case without TPU
hardware by pinning the parent to a 1-device CPU backend.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full dryrun compile at 8 virtual devices (~2 min each)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    # Parent process must come up with exactly ONE device so that
    # dryrun_multichip(8) cannot succeed in-process.
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_MTS_DRYRUN_REEXEC", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    return env


def test_dryrun_survives_preinitialized_backend():
    """Backend bound to 1 device BEFORE dryrun_multichip(8) -> must re-exec."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"  # backend now up, 1 device
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        # the dryrun grew a lockstep-grid fit and a 2-process Gloo smoke in
        # round 5 (~+90 s solo); under full-suite contention on this 1-CPU
        # host the old 600 s bound was marginal
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout, proc.stdout
    # This is the one pytest-driven dryrun that keeps the Gloo smoke ON
    # (driver fidelity — test_parallel's in-process dryrun skips it), so
    # the ~90 s must buy verification: every mode's status is asserted,
    # not just the unconditional trailing ' ok'.
    for marker in ("seq_parallel=ok", "pipeline=ok", "expert=ok",
                   "grid=ok", "multihost=ok"):
        assert marker in proc.stdout, proc.stdout


def test_dryrun_reexec_guard_no_infinite_recursion():
    """If the re-exec'd child STILL lacks devices, it must fail, not recurse."""
    code = (
        "import os, jax\n"
        "os.environ['_MTS_DRYRUN_REEXEC'] = '1'\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()\n"
        "import __graft_entry__ as g\n"
        "try:\n"
        "    g.dryrun_multichip(8)\n"
        "except AssertionError as e:\n"
        "    print('GUARD_OK', e)\n"
        "else:\n"
        "    raise SystemExit('expected AssertionError')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert "GUARD_OK" in proc.stdout, proc.stdout
