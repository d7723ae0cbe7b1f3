"""Post-hoc evaluation over a grid of trained experiments.

Reference contract (/root/reference/compute_accuracy_metrics_sentence.py):
`python compute_accuracy_metrics_sentence.py {nonnews,radionews}` loads each
experiment's `all_scores.json` for the hard-coded 15-entry encoder lists
(:137-172), recomputes predictions as sigmoid(score) > 0.5 (:201), scores
per-document F1/precision/recall (final unit dropped, :203-207) and
B-measures (:209-213), bootstraps 10k CIs, runs pairwise significance
tests (Shapiro -> t-test with Welch variance-ratio switch, else
Mann-Whitney U, :280-326) against the text-only `radio_news_topseg` and the
best tri-modal fusion baselines, and writes `final_result_bilstm.csv`.

Fixed vs the reference (defect, not copied): the nonnews branch referenced
an undefined `experiment_name` (:84); here both corpora use explicit,
overridable directory roots. The directory layout and encoder lists default
to the reference's.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import re
import sys

import numpy as np
import pandas as pd
from scipy.stats import mannwhitneyu, shapiro, ttest_ind
from sklearn.metrics import f1_score, precision_score, recall_score

from ..eval.metrics import b_measure

ENCODERS = {
    "nonnews": [
        "x-vectors",
        "openl3/_mean_std",
        "radio_news_roberta",
        "radio_news_topseg",
        "radio_news_roberta+radio_news_topseg",
        "x-vectors+openl3/_mean_std",
        "NonNewsSentence/openl3/_mean_std+NonNewsSentence/non_news_roberta",
        "NonNewsSentence/openl3/_mean_std+NonNewsSentence/non_news_topseg",
        "NonNewsSentence/openl3/_mean_std+NonNewsSentence/non_news_roberta+NonNewsSentence/non_news_topseg",
        "NonNewsSentence/x-vectors+NonNewsSentence/non_news_roberta",
        "NonNewsSentence/x-vectors+NonNewsSentence/non_news_topseg",
        "NonNewsSentence/x-vectors+NonNewsSentence/non_news_roberta+NonNewsSentence/non_news_topseg",
        "NonNewsSentence/x-vectors+NonNewsSentence/openl3/_mean_std+NonNewsSentence/non_news_roberta",
        "NonNewsSentence/x-vectors+NonNewsSentence/openl3/_mean_std+NonNewsSentence/non_news_topseg",
        "NonNewsSentence/x-vectors+NonNewsSentence/openl3/_mean_std+NonNewsSentence/non_news_roberta+NonNewsSentence/non_news_topseg",
    ],
    "radionews": [
        "x-vectors",
        "openl3/_mean_std",
        "radio_news_roberta",
        "radio_news_topseg",
        "radio_news_roberta+radio_news_topseg",
        "x-vectors+openl3/_mean_std",
        "RadioNewsSentence/openl3/_mean_std+RadioNewsSentence/radio_news_roberta",
        "RadioNewsSentence/openl3/_mean_std+RadioNewsSentence/radio_news_topseg",
        "RadioNewsSentence/openl3/_mean_std+RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg",
        "RadioNewsSentence/x-vectors+RadioNewsSentence/radio_news_roberta",
        "RadioNewsSentence/x-vectors+RadioNewsSentence/radio_news_topseg",
        "RadioNewsSentence/x-vectors+RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg",
        "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std+RadioNewsSentence/radio_news_roberta",
        "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std+RadioNewsSentence/radio_news_topseg",
        "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std+RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg",
    ],
}

TEXT_BASELINE = "radio_news_topseg"
FUSION_BASELINE = "openl3/_mean_std+radio_news_roberta+radio_news_topseg"


def sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def bootstrap_mean_ci(values, samples=10000, seed=0):
    values = np.asarray(values, np.float64)
    rng = np.random.default_rng(seed)
    boots = rng.choice(values, size=(samples, len(values)), replace=True).mean(axis=1)
    ci = (np.percentile(boots, 97.5) - np.percentile(boots, 2.5)) / 2
    return float(np.mean(boots)), float(ci)


def compute_pvalues(scores, sorted_indices, df, b, normal_b, use_ttest=True):
    """Pairwise significance vs baseline `b` and vs the best system `c`
    (reference compute_pvalues, :280-326)."""
    p1s = np.zeros(len(df))
    p2s = np.zeros(len(df))
    c = None
    normal_c = False
    for index, e in enumerate(sorted_indices[:-1]):
        if not index:
            c = scores[df.iloc[e, df.columns.get_loc("embedding")]]
            normal_c = shapiro(c).pvalue > 0.05
        a = scores[df.iloc[e, df.columns.get_loc("embedding")]]
        normal_a = shapiro(a).pvalue > 0.01

        def pvalue(x, y, alternative="two-sided", normal_y=True):
            if (normal_a and normal_y) or use_ttest:
                var_x, var_y = np.var(x), np.var(y)
                ratio = max(var_x, var_y) / max(min(var_x, var_y), 1e-12)
                if ratio > 4:
                    return ttest_ind(x, y, equal_var=False, alternative=alternative).pvalue
                return ttest_ind(x, y, alternative=alternative).pvalue
            return mannwhitneyu(x, y).pvalue

        p1s[e] = pvalue(a, b, normal_y=normal_b)
        p2s[e] = pvalue(a, c, alternative="less", normal_y=normal_c)
    return p1s, p2s


def main(args):
    corpus = args.corpus
    if corpus not in ("nonnews", "radionews"):
        raise ValueError("Enter one of nonnews or radionews as function argument!")

    if corpus == "nonnews":
        root = args.root or "NonNewsSentence"
        split_path = os.path.join(root, "NonNews_split.json")
        lab_path = os.path.join(root, "NonNewsSentence", "labs_dict.pkl")
        prefixes = [os.path.join(root, args.experiments or "UnimodalExperiments")]
    else:
        root = args.root or "RadioNewsSentence"
        split_path = os.path.join(root, "RadioNews_split.json")
        lab_path = os.path.join(root, "RadioNewsSentence", "labs_dict.pkl")
        prefixes = [
            os.path.join(root, args.experiments or "UnimodalExperiments"),
            os.path.join(root, "NewLateFusion"),
            os.path.join(root, "ExperimentsMultimodalEarlyFusion"),
        ]

    with open(split_path) as f:
        files = json.load(f)["test"]
    with open(lab_path, "rb") as f:
        lab = pickle.load(f)

    encoders = args.encoders or ENCODERS[corpus]

    df = {
        "Precision": [], "Precision Confidence": [],
        "Recall": [], "Recall Confidence": [],
        "F1": [], "F1 Confidence": [],
        "B-F1": [], "B-Precision": [], "B-Recall": [],
        "B-F1 Confidence": [], "B-Precision Confidence": [], "B-Recall Confidence": [],
        "embedding": [],
    }
    per_metric_scores = {m: {} for m in ("f1", "precision", "recall", "bf1", "bprecision", "brecall")}

    for enc in encoders:
        d = None
        for prefix in prefixes:
            path = os.path.join(prefix, args.arch_prefix + enc, "all_scores.json")
            if os.path.exists(path):
                with open(path) as f:
                    d = json.load(f)
                break
        if d is None:
            raise ValueError(f"Directory {enc} not found among the experiments!")

        enc_clean = re.sub(r"(RadioNewsSentence|NonNewsSentence)/", "", enc)

        rows = {m: [] for m in per_metric_scores}
        for k in files:
            lab_k = k[:-4]
            pred = (sig(np.asarray(d[k]).reshape(-1)) > 0.5) + 0
            truth = np.asarray(lab[lab_k])
            rows["f1"].append(f1_score(truth[:-1], pred[:-1]))
            rows["recall"].append(recall_score(truth[:-1], pred[:-1]))
            rows["precision"].append(precision_score(truth[:-1], pred[:-1]))
            prec, rec, f1, _ = b_measure(pred.tolist(), truth.tolist())
            rows["bf1"].append(f1)
            rows["bprecision"].append(prec)
            rows["brecall"].append(rec)

        for m in per_metric_scores:
            per_metric_scores[m][enc_clean] = rows[m]

        for m, (col, ccol) in {
            "f1": ("F1", "F1 Confidence"),
            "precision": ("Precision", "Precision Confidence"),
            "recall": ("Recall", "Recall Confidence"),
            "bf1": ("B-F1", "B-F1 Confidence"),
            "bprecision": ("B-Precision", "B-Precision Confidence"),
            "brecall": ("B-Recall", "B-Recall Confidence"),
        }.items():
            mean, ci = bootstrap_mean_ci(rows[m])
            df[col].append(mean)
            df[ccol].append(ci)
        df["embedding"].append(enc_clean)

    df = pd.DataFrame(df)

    pval_specs = {
        "f1": "F1",
        "precision": "Precision",
        "recall": "Recall",
        "bf1": "B-F1",
        "bprecision": "B-Precision",
        "brecall": "B-Recall",
    }
    for baseline_key, suffixes in ((TEXT_BASELINE, ("", " 2")), (FUSION_BASELINE, ("3", " 4"))):
        for m, col in pval_specs.items():
            scores = per_metric_scores[m]
            if baseline_key not in scores:
                continue
            b = scores[baseline_key]
            normal_b = shapiro(b).pvalue > 0.05
            order = df[col].sort_values(ascending=False).index
            p1, p2 = compute_pvalues(scores, order, df, b, normal_b)
            df[f"{col} P-value{suffixes[0]}"] = p1
            df[f"{col} P-value{suffixes[1]}"] = p2

    out = args.output or "final_result_bilstm.csv"
    df.to_csv(out)
    print(f"Wrote {out} with {len(df)} encoder rows")
    return df


def build_parser():
    parser = argparse.ArgumentParser(description="Aggregate per-experiment scores")
    parser.add_argument("corpus", choices=["nonnews", "radionews"])
    parser.add_argument("--root", type=str, default=None,
                        help="corpus root (default: reference layout)")
    parser.add_argument("--experiments", type=str, default=None,
                        help="experiment subdirectory (default UnimodalExperiments)")
    parser.add_argument("--arch_prefix", type=str, default="BiLSTM_bs10_")
    parser.add_argument("--encoders", nargs="*", default=None,
                        help="override the hard-coded encoder list")
    parser.add_argument("--output", type=str, default=None)
    return parser


def cli_main(argv=None):
    return main(build_parser().parse_args(argv))


if __name__ == "__main__":
    cli_main()
