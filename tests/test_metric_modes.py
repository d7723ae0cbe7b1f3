"""Trainer.test in the B-measure and WinPR (--metric b / scaiano) modes."""
import numpy as np
import pytest

import jax

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.train.data import batches, load_dataset_from_precomputed
from multimodaltopicsegmentation_tpu.train.loop import Trainer
from tests.synth import make_synthetic_corpus


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    emb_dir, lab_file, split = make_synthetic_corpus(str(d), n_docs=8, dim=16, noise=0.05)
    folds = load_dataset_from_precomputed(emb_dir, lab_file, split=split)
    train, test, val = folds[0]
    tb = list(batches(train, 4, crf=False, truncate=False, truncate_value=100))
    eb = list(batches(test + val, 1, crf=False, truncate=False, truncate_value=100))
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=1, loss_fn="FocalLoss")
    tr = Trainer("BiLSTM", cfg, lr=1e-2, max_epochs=20, patience=40,
                 monitor="training_loss", check_dir=str(d / "ck"))
    params, _ = tr.fit(tb, None)
    return tr, params, eb


def test_metric_b_mode(trained):
    tr, params, eb = trained
    tr.metric = "b"
    tr.threshold = 0.5
    res, per_doc, scores = tr.test(params, eb)
    assert set(res) == {"b_precision", "b_recall", "b_f1", "threshold", "test_loss"}
    for k in ("b_precision", "b_recall", "b_f1", "test_loss"):
        assert 0.0 <= res[k] <= 1.0


def test_metric_scaiano_mode(trained):
    tr, params, eb = trained
    tr.metric = "scaiano"
    tr.threshold = 0.5
    res, per_doc, scores = tr.test(params, eb)
    # f1 moves into test_loss (the reference's own pop crashes here; ours works)
    assert "b_f1" not in res
    assert 0.0 <= res["test_loss"] <= 1.0
    assert 0.0 <= res["b_precision"] <= 1.0


def test_use_end_boundary_mode(trained):
    tr, params, eb = trained
    tr.metric = "Pk"
    tr.threshold = 0.5
    tr.eb = True
    res, _, _ = tr.test(params, eb)
    assert 0.0 <= res["test_loss"] <= 1.0
    tr.eb = False


def test_zero_baseline_mode(trained):
    tr, params, eb = trained
    tr.metric = "Pk"
    tr.zero_baseline = True
    res, _, _ = tr.test(params, eb)
    tr.zero_baseline = False
    assert res["threshold"] == 0.4  # reference's zero-baseline threshold
    assert res["F1_loss"] == 0.0  # never predicts a boundary
