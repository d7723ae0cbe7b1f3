"""Working -sth threshold search on validation documents."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.train.data import batches
from multimodaltopicsegmentation_tpu.train.loop import Trainer
from tests.synth import make_synthetic_corpus
from multimodaltopicsegmentation_tpu.train.data import load_dataset_from_precomputed


def test_threshold_search_returns_candidate(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=8, dim=16, noise=0.05)
    folds = load_dataset_from_precomputed(emb_dir, lab_file, split=split)
    train, test, val = folds[0]
    tb = list(batches(train, 4, crf=False, truncate=False, truncate_value=100))
    vb = list(batches(val, 4, crf=False, truncate=False, truncate_value=100))

    cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=1, loss_fn="FocalLoss")
    tr = Trainer("BiLSTM", cfg, lr=1e-2, max_epochs=25, patience=50,
                 monitor="val_loss", check_dir=str(tmp_path / "ck"))
    params, _ = tr.fit(tb, vb)
    th, val_pk = tr.search_threshold(params, vb)
    assert th in (0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6)
    assert 0.0 <= val_pk <= 1.0
    # searched threshold should not do worse than default 0.5 on validation
    tr.threshold = 0.5
    res_default, _, _ = tr.test(params, vb)
    tr.threshold = th
    res_searched, _, _ = tr.test(params, vb)
    assert res_searched["test_loss"] <= res_default["test_loss"] + 1e-9


@pytest.mark.slow
def test_sth_f1_selection_end_to_end(tmp_path):
    """-sth with a MAXIMIZED metric must actually select a best config
    (round-2 review finding: the reference-mirrored '<' comparison against
    an init of 0 never fired, leaving best_model unwritten and results.txt
    with 'Hidden units: None')."""
    import json
    import os

    from tests.synth import make_synthetic_corpus
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path / "c"), n_docs=10, dim=20)
    tf.EMBEDDING_SIZES["CNN"] = 20
    exp = str(tmp_path / "exp")
    cwd = os.getcwd()
    args = tf.build_parser().parse_args([
        "-exp", exp, "-arc", "BiLSTM", "-enc", "CNN",
        "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
        "-bs", "4", "-max", "4", "-vp", "0.2", "-pat", "3",
        "-loss", "FocalLoss", "-ar", "-as", "-split", split,
        "-hs", "-huss", "12", "-nlss", "1", "-diss", "0.0", "0.3", "-doss", "0.0",
        "-sth", "--metric", "F1",
    ])
    try:
        tf.main(args)
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Hidden units: 12" in txt, txt
    assert os.path.exists(os.path.join(exp, "checkpoints", "best_model"))
    with open(os.path.join(exp, "all_results.json")) as f:
        assert json.load(f)


@pytest.mark.parametrize("metric", ["b", "scaiano"])
def test_search_threshold_maximizes_b_metrics(tmp_path, metric):
    """For B/WinPR the search must score the ACTUAL metric and maximize
    (round-2 review: it scored Pk but took the argmax — the worst threshold)."""
    from multimodaltopicsegmentation_tpu.eval import metrics as M
    from multimodaltopicsegmentation_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    cfg = TaggerConfig(embedding_dim=10, hidden_dim=8, num_layers=1, loss_fn="FocalLoss")
    t = Trainer("BiLSTM", cfg, metric=metric, check_dir=str(tmp_path / "ck"))
    params = t.arch.init(jax.random.PRNGKey(0))
    batch = {
        "src_tokens": rng.standard_normal((3, 30, 10)).astype(np.float32),
        "tgt_tokens": (rng.random((3, 30)) < 0.2).astype(np.float32),
        "src_lengths": np.full((3,), 30, np.int32),
        "n_real": 3,
    }
    th, val = t.search_threshold(params, [batch])
    # recompute the metric at every candidate; the returned one must be best
    scores, _ = t.arch.decode(params, batch["src_tokens"], batch["src_lengths"], 0.5)
    probs = 1 / (1 + np.exp(-np.asarray(scores)[:, :, 0]))
    def metric_at(c):
        vals = []
        for i in range(3):
            pred = (probs[i] > c).astype(int).tolist()
            tgt = batch["tgt_tokens"][i].astype(int).tolist()
            vals.append(M.b_measure(pred, tgt)[3] if metric == "b" else M.win_pr(pred, tgt)[2])
        return float(np.mean(vals))
    all_vals = {c: metric_at(c) for c in [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6]}
    assert val == pytest.approx(max(all_vals.values()))
    assert metric_at(th) == pytest.approx(max(all_vals.values()))
