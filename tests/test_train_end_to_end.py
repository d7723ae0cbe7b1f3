"""End-to-end smoke tests: synthetic corpus -> train_fit CLI -> results.txt."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from multimodaltopicsegmentation_tpu.train.data import (
    load_dataset_from_precomputed,
    pad_batch,
    batches,
)
from tests.synth import make_synthetic_corpus


def test_loader_contract(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=8)
    folds = load_dataset_from_precomputed(emb_dir, lab_file, split=split)
    assert len(folds) == 1
    train, test, val = folds[0]
    assert len(train) == 5 and len(test) == 1 and len(val) == 2
    emb, lab, name = train[0]
    assert emb.ndim == 2 and len(lab) == len(emb)
    assert lab[-1] == 0  # loader zeroes the trailing boundary
    assert sum(lab) >= 1


def test_loader_kfold(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=10)
    folds = load_dataset_from_precomputed(emb_dir, lab_file, k_folds=5)
    assert len(folds) == 5
    for train, test in folds:
        assert len(test) == 2 and len(train) == 8


def test_pad_batch_shapes_and_labels(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=6)
    folds = load_dataset_from_precomputed(emb_dir, lab_file, split=split)
    docs = folds[0][0]
    b = pad_batch(docs[:3], crf=False, bucket=True)
    assert b["src_tokens"].shape[1] in (64, 128)  # bucketed
    # non-CRF label padding is -1
    i = int(np.argmin(b["src_lengths"][:3]))
    L = b["src_lengths"][i]
    if L < b["tgt_tokens"].shape[1]:
        assert b["tgt_tokens"][i, L] == -1.0
    b2 = pad_batch(docs[:3], crf=True, bucket=True)
    if L < b2["tgt_tokens"].shape[1]:
        assert b2["tgt_tokens"][i, L] == 0.0


def test_mask_inner_sentences_reproducible(tmp_path):
    emb_dir, lab_file, split = make_synthetic_corpus(str(tmp_path), n_docs=4)
    f1 = load_dataset_from_precomputed(emb_dir, lab_file, split=split, mask_inner_sentences=True)
    f2 = load_dataset_from_precomputed(emb_dir, lab_file, split=split, mask_inner_sentences=True)
    for d1, d2 in zip(f1[0][0], f2[0][0]):
        np.testing.assert_array_equal(d1[0], d2[0])
        assert d1[1] == d2[1]
    # masking must have dropped some negatives
    full = load_dataset_from_precomputed(emb_dir, lab_file, split=split)
    assert sum(len(d[1]) for d in f1[0][0]) < sum(len(d[1]) for d in full[0][0])


@pytest.mark.slow
def test_train_fit_cli_end_to_end(tmp_path):
    """The minimum end-to-end slice: run_radionews_unimodal.sh shape config
    on a synthetic corpus, few epochs, check all output artifacts."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=10, dim=32)
    exp = str(tmp_path / "exp1")

    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main

    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTM", "-enc", "CNN",  # CNN -> dim 30; but ours is 32
            "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "8", "-vp", "0.2", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-ar", "-as",
            "-split", split, "-hs", "-huss", "32", "-nlss", "1",
            "-diss", "0.0", "-doss", "0.0",
        ])
        # the synthetic corpus is 32-d; patch the dim table for the test
        import multimodaltopicsegmentation_tpu.cli.train_fit as tf

        tf.EMBEDDING_SIZES["CNN"] = 32
        main(args)
    finally:
        os.chdir(cwd)

    assert os.path.exists(os.path.join(exp, "results.txt"))
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Mean Pk obtained is" in txt
    assert "Mean F1 obtained is" in txt
    assert "Neural architecture: BiLSTM" in txt
    # the winning checkpoint (the -s_last final one) is renamed best_model,
    # exactly like the reference (train_fit.py:487-494)
    assert os.path.exists(os.path.join(exp, "checkpoints", "best_model"))
    with open(os.path.join(exp, "all_scores.json")) as f:
        scores = json.load(f)
    assert len(scores) == 1  # one test doc
    with open(os.path.join(exp, "all_results.json")) as f:
        res = json.load(f)
    assert all("Pk" in v for v in res.values())
    # grid CSVs
    assert os.path.exists(os.path.join(exp, "Pk_fit_results.csv"))


def test_train_fit_cli_device_epochs(tmp_path, capsys):
    """--device_epochs end to end: with -bs covering the whole train split,
    batch shapes are uniform, so the device-resident epoch windows actually
    engage (no host-loop fallback notice) and produce the same artifact set."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=10, dim=32)
    exp = str(tmp_path / "exp_de")

    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main

    args = build_parser().parse_args([
        "-exp", exp, "-arc", "BiLSTM", "-enc", "CNN",
        "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
        "-bs", "16", "-max", "6", "-vp", "0.2", "-pat", "5",
        "-loss", "FocalLoss", "-s_last", "-ar", "-as",
        "-split", split, "-hs", "-huss", "32", "-nlss", "1",
        "-diss", "0.0", "-doss", "0.0", "-de",
    ])
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    main(args)
    assert "falling back to the host epoch loop" not in capsys.readouterr().err
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Mean Pk obtained is" in txt
    assert os.path.exists(os.path.join(exp, "checkpoints", "best_model"))


@pytest.mark.slow
def test_train_fit_learns_on_easy_corpus(tmp_path):
    """With clear topic structure and enough epochs, Pk should beat the
    trivial baselines by a wide margin."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(
        str(corpus), n_docs=12, dim=32, noise=0.05, seed=3
    )
    exp = str(tmp_path / "exp2")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTM", "-enc", "CNN",
            "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "60", "-vp", "0.2", "-pat", "60",
            "-loss", "FocalLoss", "-s_last",
            "-split", split, "-hu", "32", "-nl", "1",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    pk = float([l for l in txt.splitlines() if "Mean Pk" in l][0].split()[-1])
    assert pk < 0.25, f"model failed to learn: Pk={pk}"


def test_add_dataset_merges_sibling_corpus(tmp_path, monkeypatch):
    """--both_datasets derives the sibling corpus location from the primary
    embedding folder by Radio<->Non substitution at the fixed
    ../<corpus>/<corpus>/... layout (reference load_datasets_precomputed.py:14-54)."""
    import pickle
    from types import SimpleNamespace

    from multimodaltopicsegmentation_tpu.train.data import add_dataset

    rng = np.random.default_rng(0)

    def corpus(emb_dir, lab_path, n_docs, prefix):
        os.makedirs(emb_dir, exist_ok=True)
        labs = {}
        for i in range(n_docs):
            name = f"{prefix}{i:02d}"
            emb = rng.standard_normal((12, 8)).astype(np.float32)
            np.save(os.path.join(emb_dir, name + ".npy"), emb)
            labs[name] = [0] * 5 + [1] + [0] * 5 + [1]
        with open(lab_path, "wb") as f:
            pickle.dump(labs, f)

    # primary corpus under the working dir; sibling at ../NonNewsT/NonNewsT
    work = tmp_path / "work"
    corpus(str(work / "RadioNewsT" / "emb"),
           str(work / "RadioNewsT" / "labs_dict.pkl"), 5, "r")
    corpus(str(tmp_path / "NonNewsT" / "NonNewsT" / "emb"),
           str(tmp_path / "NonNewsT" / "NonNewsT" / "labs_dict.pkl"), 5, "n")

    monkeypatch.chdir(work)
    from multimodaltopicsegmentation_tpu.train.data import load_dataset_from_precomputed

    folds = load_dataset_from_precomputed(
        "RadioNewsT/emb", "RadioNewsT/labs_dict.pkl", k_folds=5
    )
    args = SimpleNamespace(
        embedding_folder="RadioNewsT/emb", embedding_folder2=None,
        delete_last_sentence=False, k_folds=5, mask_inner_sentences=False,
        mask_probability=0.9, standard_split=None,
    )
    merged = add_dataset(args, folds)
    assert len(merged) == len(folds)
    for fold, orig in zip(merged, folds):
        # each split grew by the sibling's contribution
        assert len(fold[0]) > len(orig[0])
        names = {doc[2] for doc in fold[0]} | {doc[2] for doc in fold[1]}
        assert any(n.startswith("n") for n in names), names
        assert any(n.startswith("r") for n in names), names

    # a corpus that is neither RadioNews nor NonNews must be rejected
    args.embedding_folder = "Podcast/emb"
    with pytest.raises(ValueError, match="RadioNews or NonNews"):
        add_dataset(args, folds)


@pytest.mark.slow
def test_parallel_grid_warns_when_ineligible(tmp_path, capsys):
    """-pg on a non-lockstep architecture must say so instead of silently
    training serially (round-2 review item)."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    exp = str(tmp_path / "exp_pg")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "SheikhBiLSTM", "-enc", "CNN",
            "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "2", "-vp", "0.2", "-pat", "5",
            "-loss", "BinaryCrossEntropy", "-s_last", "-split", split,
            "-hs", "-huss", "16", "-nlss", "1",
            "-diss", "0.0", "0.2", "-doss", "0.0",
            "-pg",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    assert "--parallel_grid ignored" in capsys.readouterr().err
    logs = open(os.path.join(exp, "logs")).read()
    assert "--parallel_grid ignored" in logs


def _second_modality(emb_dir, out_dir, dim2=24, seed=5):
    """Derive a second modality stream with the SAME doc names/unit counts."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    proj = None
    for f in sorted(os.listdir(emb_dir)):
        if not f.endswith(".npy"):
            continue
        e = np.load(os.path.join(emb_dir, f))
        if proj is None:
            proj = rng.standard_normal((e.shape[1], dim2)).astype(np.float32)
        np.save(os.path.join(out_dir, f),
                (e @ proj + 0.1 * rng.standard_normal((len(e), dim2))).astype(np.float32))
    return out_dir


@pytest.mark.slow
def test_train_fit_cli_early_fusion_bilstm(tmp_path):
    """run_radionews_earlyfusion.sh shape: '+'-joined encoders and embedding
    dirs concatenate into one BiLSTM input (reference train_fit.py flags,
    RadioNews-SBBC/run_radionews_earlyfusion.sh:12)."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    emb2 = _second_modality(emb_dir, str(tmp_path / "emb2"))
    exp = str(tmp_path / "exp_ef")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    tf.EMBEDDING_SIZES["roberta"] = 24
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTM", "-enc", "CNN+roberta",
            "-ef", f"{emb_dir}+{emb2}", "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "4", "-vp", "0.2", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-ar", "-as", "-split", split,
            "-hs", "-huss", "16", "-nlss", "1", "-diss", "0.0", "-doss", "0.0",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Sentence encoder: CNN+roberta" in txt
    assert "Mean Pk obtained is" in txt


@pytest.mark.slow
def test_train_fit_cli_early_fusion_transformer_focal(tmp_path):
    """BASELINE.md flagship early fusion: enc1+enc2 concat -> restricted
    Transformer (pyramidal windows) + FocalLoss, through the real CLI."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    emb2 = _second_modality(emb_dir, str(tmp_path / "emb2"))
    exp = str(tmp_path / "exp_eft")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    tf.EMBEDDING_SIZES["roberta"] = 24
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "Transformer", "-enc", "CNN+roberta",
            "-ef", f"{emb_dir}+{emb2}", "-lf", lab_file, "-lr", "1e-3",
            "-bs", "4", "-max", "2", "-vp", "0.2", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-split", split,
            "-hu", "64", "-nl", "2", "-nh", "2", "-window", "8",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Neural architecture: Transformer" in txt
    assert "Mean Pk obtained is" in txt


@pytest.mark.slow
def test_train_fit_cli_late_fusion(tmp_path):
    """run_radionews_latefusion.sh shape: -arc BiLSTMLateFusion -enc/-enc2
    -ef/-ef2 (reference :14), through the real CLI; results.txt additionally
    records the second encoder so predict can drive the checkpoint."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    emb2 = _second_modality(emb_dir, str(tmp_path / "emb2"))
    exp = str(tmp_path / "exp_lf")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    tf.EMBEDDING_SIZES["roberta"] = 24
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTMLateFusion", "-enc", "CNN",
            "-enc2", "roberta", "-ef", emb_dir, "-ef2", emb2,
            "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "4", "-vp", "0.2", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-ar", "-as", "-split", split,
            "-hs", "-huss", "16", "-nlss", "1", "-diss", "0.0", "-doss", "0.0",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Neural architecture: BiLSTMLateFusion" in txt
    assert "Second sentence encoder: roberta" in txt
    assert "Mean Pk obtained is" in txt
    assert os.path.exists(os.path.join(exp, "checkpoints", "best_model"))


@pytest.mark.slow
def test_parallel_grid_late_fusion_cli(tmp_path, capsys):
    """-pg with -arc BiLSTMLateFusion runs lockstep through the real CLI
    (round-3 grid extension) — no ineligibility warning, results produced."""
    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    emb2 = _second_modality(emb_dir, str(tmp_path / "emb2"))
    exp = str(tmp_path / "exp_pglf")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    tf.EMBEDDING_SIZES["roberta"] = 24
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTMLateFusion", "-enc", "CNN",
            "-enc2", "roberta", "-ef", emb_dir, "-ef2", emb2,
            "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "3", "-vp", "0.2", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-split", split,
            "-hs", "-huss", "16", "-nlss", "1",
            "-diss", "0.0", "0.2", "-doss", "0.0",
            "-pg",
        ])
        main(args)
    finally:
        os.chdir(cwd)
    assert "--parallel_grid ignored" not in capsys.readouterr().err
    # positive proof the lockstep path ran: GridTrainer writes per-config
    # checkpoint dirs named grid_<tag>_di<..>_do<..> (train/grid.py)
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert any(c.startswith("grid_") for c in ckpts), ckpts
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Neural architecture: BiLSTMLateFusion" in txt
    assert "Mean Pk obtained is" in txt


@pytest.mark.slow
def test_train_fit_cli_crf_with_timing(tmp_path):
    """BASELINE config 3 (low-level acoustic + BiLSTM-CRF) through the real
    CLI, with --timing_file appending 2 features per unit exactly like
    run_radionews_lowlevel_acoustic_features.sh:9 does."""
    import pickle

    corpus = tmp_path / "corpus"
    emb_dir, lab_file, split = make_synthetic_corpus(str(corpus), n_docs=8, dim=32)
    rng = np.random.default_rng(1)
    times = {}
    for f in sorted(os.listdir(emb_dir)):
        if f.endswith(".npy"):
            times[f[:-4]] = rng.random(
                (len(np.load(os.path.join(emb_dir, f))), 2)
            ).astype(np.float32).tolist()
    timing = str(tmp_path / "times.pkl")
    with open(timing, "wb") as fh:
        pickle.dump(times, fh)

    exp = str(tmp_path / "exp_crf")
    from multimodaltopicsegmentation_tpu.cli.train_fit import build_parser, main
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    tf.EMBEDDING_SIZES["CNN"] = 32
    cwd = os.getcwd()
    try:
        args = build_parser().parse_args([
            "-exp", exp, "-arc", "biLSTMCRF", "-enc", "CNN",
            "-ef", emb_dir, "-lf", lab_file, "-lr", "1e-2",
            "-bs", "4", "-max", "4", "-vp", "0.2", "-pat", "5",
            "-s_last", "-ar", "-as", "-split", split,
            "-hu", "16", "-nl", "1", "--timing_file", timing,
        ])
        main(args)
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Neural architecture: biLSTMCRF" in txt
    assert "Mean Pk obtained is" in txt
    assert os.path.exists(os.path.join(exp, "checkpoints", "best_model"))
