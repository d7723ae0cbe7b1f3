"""Env-gated wrapper for the real-device smoke suite.

The rest of the suite pins JAX to CPU for exact numerics; set
MTS_TPU_TESTS=1 to also drive every hot path on the actual accelerator:

    MTS_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -s

The smoke script runs in a subprocess so the conftest's CPU pin does not
leak into it.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("MTS_TPU_TESTS") != "1",
    reason="real-device smoke suite (set MTS_TPU_TESTS=1)",
)
def test_tpu_smoke():
    env = dict(os.environ)
    # conftest pinned this process to CPU; the child gets the TPU backend
    # (this image's sitecustomize registers it under the 'axon' platform)
    env["JAX_PLATFORMS"] = os.environ.get("MTS_TPU_PLATFORM", "axon")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, proc.stdout + proc.stderr
