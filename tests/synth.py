"""Synthetic precomputed-embedding corpus for end-to-end tests.

Writes the reference's on-disk contract: `{doc_id}.npy` [n_units, dim]
embeddings, `labs_dict.pkl`, and a split JSON. Topic segments get distinct
mean vectors so a tagger can actually learn boundaries.
"""
import json
import os
import pickle

import numpy as np


def make_synthetic_corpus(
    out_dir: str,
    n_docs: int = 12,
    dim: int = 32,
    min_units: int = 30,
    max_units: int = 80,
    n_topics: int = 4,
    seed: int = 0,
    noise: float = 0.15,
):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    emb_dir = os.path.join(out_dir, "embeddings")
    os.makedirs(emb_dir, exist_ok=True)

    topic_means = rng.standard_normal((n_topics * 4, dim))
    labs = {}
    names = []
    for d in range(n_docs):
        n = int(rng.integers(min_units, max_units))
        n_segs = int(rng.integers(2, n_topics + 1))
        cuts = sorted(rng.choice(np.arange(4, n - 2), n_segs - 1, replace=False))
        lab = [0] * n
        emb = np.zeros((n, dim), np.float32)
        prev = 0
        prev_mean_idx = -1
        for c in list(cuts) + [n]:
            # adjacent segments must use distinct means or the boundary is
            # statistically invisible
            mean_idx = int(rng.integers(0, len(topic_means)))
            while mean_idx == prev_mean_idx:
                mean_idx = int(rng.integers(0, len(topic_means)))
            prev_mean_idx = mean_idx
            mean = topic_means[mean_idx]
            emb[prev:c] = mean[None, :] + noise * rng.standard_normal((c - prev, dim))
            if c < n:
                lab[c - 1] = 1
            prev = c
        lab[-1] = 1  # final boundary (zeroed by the loader, like real corpora)
        name = f"{d:03d}doc"
        np.save(os.path.join(emb_dir, name + ".npy"), emb)
        labs[name] = lab
        names.append(name + ".npy")

    with open(os.path.join(out_dir, "labs_dict.pkl"), "wb") as f:
        pickle.dump(labs, f)

    n_train = max(1, int(n_docs * 0.7))
    n_test = max(1, int(n_docs * 0.15))
    split = {
        "train": names[:n_train],
        "test": names[n_train : n_train + n_test],
        "validation": names[n_train + n_test :],
    }
    with open(os.path.join(out_dir, "split.json"), "w") as f:
        json.dump(split, f)
    return emb_dir, os.path.join(out_dir, "labs_dict.pkl"), os.path.join(out_dir, "split.json")
