"""Timing-feature concat path (+2 dims per unit) and early-fusion '+' dirs."""
import os
import pickle

import numpy as np

from multimodaltopicsegmentation_tpu.train.data import load_dataset_from_precomputed
from tests.synth import make_synthetic_corpus


def test_timing_file_appends_two_dims(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=4, dim=16)
    # per-doc [n_units, 2] timing features, like nltk_sents_timings.pkl
    times = {}
    for f in os.listdir(emb_dir):
        n = np.load(os.path.join(emb_dir, f)).shape[0]
        times[f[:-4]] = np.stack(
            [np.arange(n, dtype=np.float32), np.arange(1, n + 1, dtype=np.float32)], 1
        )
    tpath = str(tmp_path / "timings.pkl")
    with open(tpath, "wb") as fh:
        pickle.dump(times, fh)

    folds = load_dataset_from_precomputed(emb_dir, lab_file, split=split, timing_info=tpath)
    for docs in folds[0]:
        for emb, lab, name in docs:
            assert emb.shape[1] == 18  # 16 + 2
            np.testing.assert_array_equal(emb[:, 16], np.arange(len(lab)))


def test_early_fusion_plus_dirs(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=4, dim=8)
    # second modality: same docs, different dim
    emb_dir2 = str(tmp_path / "emb2")
    os.makedirs(emb_dir2)
    for f in os.listdir(emb_dir):
        n = np.load(os.path.join(emb_dir, f)).shape[0]
        np.save(os.path.join(emb_dir2, f), np.ones((n, 3), np.float32))

    folds = load_dataset_from_precomputed(
        emb_dir + "+" + emb_dir2, lab_file, split=split
    )
    for docs in folds[0]:
        for emb, lab, name in docs:
            assert emb.shape[1] == 11  # 8 + 3
            np.testing.assert_array_equal(emb[:, 8:], 1.0)
