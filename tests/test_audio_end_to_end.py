"""Raw-audio end-to-end: synthetic wavs -> extract -> train -> predict."""
import json
import os
import pickle

import numpy as np
import pytest

from multimodaltopicsegmentation_tpu.utils.audio import save_wav


def make_audio_corpus(out_dir, n_docs=3, sr=16000, seed=0):
    """Synthetic 'broadcasts': topics are distinct carrier tones; returns the
    transcript dir, audio dir, and flat sentence-boundary labels."""
    rng = np.random.default_rng(seed)
    audio_dir = os.path.join(out_dir, "audio")
    data_dir = os.path.join(out_dir, "transcripts")
    os.makedirs(audio_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    flat_labs = []
    for d in range(n_docs):
        n_topics = int(rng.integers(2, 4))
        sents_per_topic = rng.integers(2, 4, n_topics)
        sent_dur = 4.0
        t_cursor = 0.0
        sentences = []
        audio = []
        for topic in range(n_topics):
            tone = 150.0 + 80.0 * rng.integers(0, 5)
            for s in range(int(sents_per_topic[topic])):
                t = np.arange(int(sent_dur * sr)) / sr
                sig = 0.4 * np.sin(2 * np.pi * tone * t) + 0.02 * rng.standard_normal(len(t))
                audio.append(sig.astype(np.float32))
                sentences.append(
                    {"sentence": f"s{len(sentences)}", "start": t_cursor, "end": t_cursor + sent_dur}
                )
                t_cursor += sent_dur
                flat_labs.append(1 if s == int(sents_per_topic[topic]) - 1 else 0)
        name = f"doc{d}"
        save_wav(os.path.join(audio_dir, name + ".wav"), np.concatenate(audio), sr)
        with open(os.path.join(data_dir, name + ".json"), "w") as f:
            json.dump(sentences, f)
    lab_path = os.path.join(out_dir, "labels.npy")
    np.save(lab_path, np.asarray(flat_labs))
    return audio_dir, data_dir, lab_path


@pytest.mark.slow
def test_extract_train_predict_mfcc(tmp_path):
    from multimodaltopicsegmentation_tpu.cli.extract_embeddings import (
        build_parser as extract_parser,
        main as extract_main,
    )

    audio_dir, data_dir, lab_path = make_audio_corpus(str(tmp_path))
    emb_dir = str(tmp_path / "emb")
    lab_out = str(tmp_path / "labs")

    args = extract_parser().parse_args([
        "-data", data_dir, "-audio", audio_dir, "-od", emb_dir,
        "-lab", lab_path, "-lod", lab_out, "--mfcc", "-vd",  # -vd => uniform
        "-ui", "1.0",
    ])
    extract_main(args)

    files = [f for f in os.listdir(emb_dir) if f.endswith(".npy")]
    assert len(files) == 3
    emb = np.load(os.path.join(emb_dir, files[0]))
    assert emb.ndim == 2 and emb.shape[1] == 200

    with open(os.path.join(lab_out, "labs_dict.pkl"), "rb") as f:
        labs = pickle.load(f)
    assert set(labs.keys()) == {"doc0", "doc1", "doc2"}
    for name in labs:
        n_units = np.load(os.path.join(emb_dir, name + ".npy")).shape[0]
        assert len(labs[name]) == n_units
        assert labs[name][-1] == 1  # trailing boundary convention

    # units are 1 s: ~4 units per sentence; boundary labels land on
    # topic-final units
    assert all(sum(l) >= 2 for l in labs.values())

    # ---- train on the extracted embeddings -------------------------------
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf

    split = {"train": [f for f in files], "test": [files[0]], "validation": [files[1]]}
    # re-use docs across splits (tiny corpus); loader pops stacks per listdir
    split_path = str(tmp_path / "split.json")
    with open(split_path, "w") as f:
        json.dump({"train": files[:1], "test": files[1:2], "validation": files[2:]}, f)

    exp = str(tmp_path / "exp")
    cwd = os.getcwd()
    try:
        targs = tf.build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTM", "-enc", "mfcc",
            "-ef", emb_dir, "-lf", os.path.join(lab_out, "labs_dict.pkl"),
            "-lr", "1e-2", "-bs", "2", "-max", "5", "-vp", "0.3", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-split", split_path,
            "-hu", "16", "-nl", "1",
        ])
        tf.main(targs)
    finally:
        os.chdir(cwd)
    assert os.path.exists(os.path.join(exp, "results.txt"))

    # ---- end-to-end predict from raw audio -------------------------------
    from multimodaltopicsegmentation_tpu.cli.predict import cli_main as predict_main

    pred_emb = str(tmp_path / "pred_emb")
    pred_exp = str(tmp_path / "pred_exp")
    results = predict_main([
        "-ee", "-ef", pred_emb, "-hyp", os.path.join(exp, "results.txt"),
        "-model", os.path.join(exp, "checkpoints", "best_model"),
        "-exp", pred_exp, "-af", audio_dir, "-ui", "1.0", "-th", "0.5",
    ])
    assert len(results) == 3
    with open(os.path.join(pred_exp, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert len(res) == 3
    # wrote audio segments for docs with detected boundaries
    seg_dir = os.path.join(pred_exp, "audio_segments")
    assert os.path.exists(seg_dir)


@pytest.mark.slow
def test_extract_wav2vec_smoke(tmp_path, monkeypatch):
    """Raw audio through the NEURAL (wav2vec2) extraction path with random
    weights (MTS_RANDOM_ENCODER_WEIGHTS=1): batched device encode, the 7
    pooling-variant dirs, label alignment."""
    from multimodaltopicsegmentation_tpu.cli.extract_embeddings import (
        build_parser as extract_parser,
        main as extract_main,
    )

    monkeypatch.setenv("MTS_RANDOM_ENCODER_WEIGHTS", "1")
    monkeypatch.setenv("MTS_WAV2VEC2_TINY", "1")  # tiny geometry if supported
    audio_dir, data_dir, lab_path = make_audio_corpus(str(tmp_path), n_docs=2)
    emb_dir = str(tmp_path / "emb")
    lab_out = str(tmp_path / "labs")

    args = extract_parser().parse_args([
        "-data", data_dir, "-audio", audio_dir, "-od", emb_dir,
        "-lab", lab_path, "-lod", lab_out, "--wav2vec", "-vd", "-ui", "2.0",
    ])
    extract_main(args)

    mean_dir = os.path.join(emb_dir, "_mean")
    assert os.path.isdir(mean_dir), os.listdir(emb_dir)
    files = [f for f in os.listdir(mean_dir) if f.endswith(".npy")]
    assert len(files) == 2
    emb = np.load(os.path.join(mean_dir, files[0]))
    assert emb.ndim == 2
    assert np.all(np.isfinite(emb))
    with open(os.path.join(lab_out, "labs_dict.pkl"), "rb") as f:
        labs = pickle.load(f)
    for name in labs:
        n_units = np.load(os.path.join(mean_dir, name + ".npy")).shape[0]
        assert len(labs[name]) == n_units


@pytest.mark.slow
def test_late_fusion_raw_audio_predict(tmp_path):
    """BASELINE.md 'late fusion ensemble + raw-audio end-to-end predict':
    train -arc BiLSTMLateFusion through the real train_fit.py, then drive
    raw audio -> segmented wavs through the real predict.py with the
    late-fusion checkpoint (the reference predict.py has no late-fusion
    support at all, predict.py:218-225 — this is beyond-parity)."""
    import json as _json

    from multimodaltopicsegmentation_tpu.cli.extract_embeddings import (
        build_parser as extract_parser,
        main as extract_main,
    )
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf
    from multimodaltopicsegmentation_tpu.cli.predict import cli_main as predict_main

    audio_dir, data_dir, lab_path = make_audio_corpus(str(tmp_path))
    emb_dir = str(tmp_path / "emb")
    lab_out = str(tmp_path / "labs")
    extract_main(extract_parser().parse_args([
        "-data", data_dir, "-audio", audio_dir, "-od", emb_dir,
        "-lab", lab_path, "-lod", lab_out, "--mfcc", "-vd", "-ui", "1.0",
    ]))
    files = sorted(f for f in os.listdir(emb_dir) if f.endswith(".npy"))
    split_path = str(tmp_path / "split.json")
    with open(split_path, "w") as f:
        _json.dump({"train": files[:1], "test": files[1:2], "validation": files[2:]}, f)

    # both modalities are mfcc streams here — the plumbing under test is the
    # two-tower train + two-stream predict, not the encoders themselves
    exp = str(tmp_path / "exp_lf")
    cwd = os.getcwd()
    try:
        tf.main(tf.build_parser().parse_args([
            "-exp", exp, "-arc", "BiLSTMLateFusion", "-enc", "mfcc",
            "-enc2", "mfcc", "-ef", emb_dir, "-ef2", emb_dir,
            "-lf", os.path.join(lab_out, "labs_dict.pkl"),
            "-lr", "1e-2", "-bs", "2", "-max", "4", "-vp", "0.3", "-pat", "5",
            "-loss", "FocalLoss", "-s_last", "-split", split_path,
            "-hu", "16", "-nl", "1",
        ]))
    finally:
        os.chdir(cwd)
    txt = open(os.path.join(exp, "results.txt")).read()
    assert "Second sentence encoder: mfcc" in txt

    pred_emb = str(tmp_path / "pred_emb")
    pred_exp = str(tmp_path / "pred_exp")
    results = predict_main([
        "-ee", "-ef", pred_emb, "-hyp", os.path.join(exp, "results.txt"),
        "-model", os.path.join(exp, "checkpoints", "best_model"),
        "-exp", pred_exp, "-af", audio_dir, "-ui", "1.0", "-th", "0.5",
    ])
    assert len(results) == 3
    # second-modality stream was extracted into the derived _enc2 folder
    assert os.path.isdir(pred_emb + "_enc2")
    with open(os.path.join(pred_exp, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert len(res) == 3
    assert os.path.exists(os.path.join(pred_exp, "audio_segments"))
