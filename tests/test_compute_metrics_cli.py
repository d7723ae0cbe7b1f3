"""compute_accuracy_metrics_sentence CLI on a synthetic experiment layout."""
import json
import os
import pickle

import numpy as np

from multimodaltopicsegmentation_tpu.cli.compute_accuracy_metrics_sentence import (
    build_parser,
    main,
)


def test_metrics_aggregation(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "RadioNewsSentence"
    (root / "RadioNewsSentence").mkdir(parents=True)
    exp_root = root / "UnimodalExperiments"

    files = [f"{i:03d}doc.npy" for i in range(5)]
    labs = {}
    for f in files:
        n = int(rng.integers(20, 40))
        lab = (rng.random(n) < 0.2).astype(int)
        lab[-1] = 1
        labs[f[:-4]] = lab.tolist()
    with open(root / "RadioNewsSentence" / "labs_dict.pkl", "wb") as fh:
        pickle.dump(labs, fh)
    with open(root / "RadioNews_split.json", "w") as fh:
        json.dump({"train": [], "test": files, "validation": []}, fh)

    encoders = ["radio_news_topseg", "x-vectors", "openl3/_mean_std+radio_news_roberta+radio_news_topseg"]
    for enc in encoders:
        d = {}
        for f in files:
            n = len(labs[f[:-4]])
            # scores biased toward the truth so metrics are non-trivial
            truth = np.asarray(labs[f[:-4]], float)
            d[f] = (4 * truth - 2 + rng.standard_normal(n)).tolist()
        exp_dir = exp_root / ("BiLSTM_bs10_" + enc)
        exp_dir.mkdir(parents=True)
        with open(exp_dir / "all_scores.json", "w") as fh:
            json.dump(d, fh)

    out = str(tmp_path / "final.csv")
    args = build_parser().parse_args(
        ["radionews", "--root", str(root), "--encoders"] + encoders + ["--output", out]
    )
    df = main(args)

    assert os.path.exists(out)
    assert len(df) == 3
    assert set(df["embedding"]) == {
        "radio_news_topseg",
        "x-vectors",
        "openl3/_mean_std+radio_news_roberta+radio_news_topseg",
    }
    assert (df["F1"] > 0.5).all()  # scores track the truth
    assert "F1 P-value" in df.columns and "F1 P-value 4" in df.columns


import pytest


@pytest.mark.slow
def test_train_fit_chain(tmp_path, monkeypatch):
    """The reference flow chained END TO END: cli/train_fit.py trains real
    experiments (producing all_scores.json), then
    compute_accuracy_metrics_sentence consumes those ACTUAL experiment
    folders (reference layout compute_accuracy_metrics_sentence.py:137-187)
    — so a format drift between the two CLIs fails here even if each CLI's
    own synthetic-layout tests still pass."""
    import shutil

    from tests.synth import make_synthetic_corpus
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser as tf_parser

    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(
        str(corpus), n_docs=20, dim=32, noise=0.05, seed=3
    )

    # reference corpus layout the metrics CLI expects
    root = tmp_path / "RadioNewsRoot"
    (root / "RadioNewsSentence").mkdir(parents=True)
    shutil.copy(split, root / "RadioNews_split.json")
    shutil.copy(lab_file, root / "RadioNewsSentence" / "labs_dict.pkl")

    encoders = ["radio_news_topseg", "x-vectors"]
    cwd = os.getcwd()
    for enc in encoders:
        exp = str(root / "UnimodalExperiments" / f"BiLSTM_bs4_{enc}")
        try:
            args = tf_parser().parse_args([
                "-exp", exp, "-arc", "BiLSTM", "-enc", enc,
                "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
                "-bs", "4", "-max", "6", "-vp", "0.2", "-pat", "5",
                "-loss", "FocalLoss", "-s_last", "-ar", "-as",
                "-split", split, "-hs", "-huss", "32", "-nlss", "1",
                "-diss", "0.0", "-doss", "0.0",
            ])
            # synthetic corpus is 32-d; setitem so the real dims (768/512)
            # are restored for later tests in the same process
            monkeypatch.setitem(tf.EMBEDDING_SIZES, enc, 32)
            tf.main(args)
        finally:
            os.chdir(cwd)
        assert os.path.exists(os.path.join(exp, "all_scores.json"))

    out = str(tmp_path / "final_result_bilstm.csv")
    args = build_parser().parse_args([
        "radionews", "--root", str(root), "--experiments", "UnimodalExperiments",
        "--arch_prefix", "BiLSTM_bs4_", "--encoders", *encoders,
        "--output", out,
    ])
    df = main(args)

    assert os.path.exists(out)
    assert set(df["embedding"]) == set(encoders)
    # every metric column is a finite probability-like value over the REAL
    # train_fit scores (3 test docs in the split)
    for col in ("F1", "Precision", "Recall", "B-F1", "B-Precision", "B-Recall"):
        assert np.isfinite(df[col]).all() and (df[col] >= 0).all() and (df[col] <= 1).all()
    # the text-only baseline is among the encoders, so its significance
    # columns must appear (reference :329-359)
    assert "F1 P-value" in df.columns and "F1 P-value 2" in df.columns
