"""The README-advertised shell experiment drivers must actually run.

The e2e suites drive cli/train_fit.py directly; this one executes the
user-facing `scripts/RadioNews-SBBC/run_radionews_unimodal.sh` (the shape of
all 8 drivers — same flag wiring, relative-path conventions and results.txt
contract as /root/reference/RadioNews-SBBC/run_radionews_unimodal.sh) against
a tiny synthetic corpus, trimmed via the script's documented MTS_* test
hooks. The scripts hard-code `python ../train_fit.py` and corpus paths
relative to the data directory (the reference's layout: the data dir sits
next to train_fit.py), so the corpus is staged in a scratch dir inside the
repository root.
"""
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_run_radionews_unimodal_driver():
    from tests.synth import make_synthetic_corpus

    data_dir = tempfile.mkdtemp(prefix=".driver_test_", dir=REPO)
    try:
        corpus = os.path.join(data_dir, "c")
        emb_dir, labs, split = make_synthetic_corpus(
            corpus, n_docs=8, dim=30, min_units=15, max_units=30
        )
        sent = os.path.join(data_dir, "RadioNewsSentence")
        os.makedirs(sent)
        shutil.move(emb_dir, os.path.join(sent, "CNN"))
        shutil.move(labs, os.path.join(sent, "labs_dict.pkl"))
        shutil.move(split, os.path.join(data_dir, "RadioNews_split.json"))

        env = dict(os.environ)
        env.update(
            MTS_ENCODERS="CNN",
            MTS_MAX_EPOCHS="2",
            MTS_PATIENCE="2",
            MTS_FORCE_CPU="1",  # core.jax_setup honors this in the CLI shims
        )
        # The driver subprocess is strictly single-device (MTS_FORCE_CPU,
        # no parallel flags), so the XLA:CPU AOT-cache + collectives
        # deadlock (tests/conftest.py) cannot occur in it — hand it the
        # suite's persistent compile cache. Measured: this test is the
        # single slowest in the suite (206 s) and is compile-dominated.
        cache = os.environ.get(
            "MTS_TEST_JAX_CACHE", os.path.join(REPO, "tests", ".jax_cache")
        )
        if cache != "0":
            env["JAX_COMPILATION_CACHE_DIR"] = cache
            env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
        script = os.path.join(REPO, "scripts", "RadioNews-SBBC",
                              "run_radionews_unimodal.sh")
        proc = subprocess.run(
            ["bash", script, "4", "exp", "Pk"],
            cwd=data_dir, env=env, capture_output=True, text=True, timeout=1800,
        )
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

        results = os.path.join(data_dir, "exp", "BiLSTM_bs4_CNN", "results.txt")
        assert os.path.exists(results), os.listdir(data_dir)
        text = open(results).read()
        # the metric lines predict.py parses back must be present
        assert "Mean Pk obtained is" in text
        assert "Mean WD obtained is" in text
        assert "Neural architecture: BiLSTM" in text
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
