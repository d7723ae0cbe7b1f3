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
