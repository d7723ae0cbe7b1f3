#!/usr/bin/env python
"""End-to-end `predict.py` CLI throughput on a synthetic wav corpus.

Measures the FULL user journey the reference's predict.py implements
(/root/reference/predict.py): decode wavs -> uniform 1 s unitization (the
-vd flag is store_false on --vad, matching predict.py's hardcoded
vad=False contract) -> neural encoder -> tagger decode -> threshold ->
segmented wavs written to disk — including all host IO, not just the
device pipeline bench.py times.

Corpus: N_DOCS synthetic 16 kHz broadcasts of DOC_MIN minutes each (tone
topics + noise). Encoder: wav2vec2-base with random weights
(MTS_RANDOM_ENCODER_WEIGHTS=1 — same FLOPs as pretrained; no egress in
this image). The tagger is a tiny BiLSTM trained for a few epochs first
(predict needs a real checkpoint + results.txt hyperparameters).

Prints cold (includes jit compiles) and warm (second in-process run)
audio-min/s. Usage: python scripts/bench_predict_cli.py [n_docs] [doc_min]
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MTS_RANDOM_ENCODER_WEIGHTS", "1")

SR = 16000


def make_corpus(root, n_docs, doc_min, seed=0):
    """Same contract as tests.test_audio_end_to_end.make_audio_corpus
    (timestamped {"sentence","start","end"} JSON transcripts + one FLAT
    labels.npy across docs), scaled up to doc_min-minute documents."""
    from multimodaltopicsegmentation_tpu.utils.audio import save_wav

    rng = np.random.default_rng(seed)
    audio_dir = os.path.join(root, "audio")
    data_dir = os.path.join(root, "transcripts")
    os.makedirs(audio_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    flat_labs = []
    sent_dur = 4.0
    sents_per_doc = int(doc_min * 60 / sent_dur)
    for d in range(n_docs):
        t_cursor = 0.0
        sentences = []
        audio = []
        sents_left_in_topic = 0
        for s in range(sents_per_doc):
            if sents_left_in_topic == 0:
                sents_left_in_topic = int(rng.integers(4, 10))
                tone = 150.0 + 80.0 * rng.integers(0, 5)
            t = np.arange(int(sent_dur * SR)) / SR
            sig = 0.4 * np.sin(2 * np.pi * tone * t) + 0.02 * rng.standard_normal(len(t))
            audio.append(sig.astype(np.float32))
            sentences.append(
                {"sentence": f"s{s}", "start": t_cursor, "end": t_cursor + sent_dur}
            )
            t_cursor += sent_dur
            sents_left_in_topic -= 1
            flat_labs.append(1 if sents_left_in_topic == 0 else 0)
        save_wav(os.path.join(audio_dir, f"doc{d}.wav"), np.concatenate(audio), SR)
        with open(os.path.join(data_dir, f"doc{d}.json"), "w") as f:
            json.dump(sentences, f)
    lab_path = os.path.join(root, "labels.npy")
    np.save(lab_path, np.asarray(flat_labs))
    return audio_dir, data_dir, lab_path, n_docs * doc_min


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    doc_min = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0

    from multimodaltopicsegmentation_tpu.cli.extract_embeddings import (
        build_parser as extract_parser,
        main as extract_main,
    )
    import multimodaltopicsegmentation_tpu.cli.train_fit as tf
    from multimodaltopicsegmentation_tpu.cli.predict import cli_main as predict_main

    root = tempfile.mkdtemp(prefix="bench_predict_cli_")
    try:
        audio_dir, data_dir, lab_path, total_min = make_corpus(root, n_docs, doc_min)
        print(f"corpus: {n_docs} docs x {doc_min} min = {total_min} audio-min",
              file=sys.stderr, flush=True)

        emb_dir = os.path.join(root, "emb")
        lab_out = os.path.join(root, "labs")
        extract_main(extract_parser().parse_args([
            "-data", data_dir, "-audio", audio_dir, "-od", emb_dir,
            "-lab", lab_path, "-lod", lab_out, "--wav2vec" if os.environ.get("BENCH_CLI_MFCC") != "1" else "--mfcc", "-vd", "-ui", "1.0",
        ]))
        if os.environ.get("BENCH_CLI_MFCC") != "1":
            emb_dir = os.path.join(emb_dir, "_mean_std")  # frame-level -> pooled dir
        files = sorted(f for f in os.listdir(emb_dir) if f.endswith(".npy"))
        split_path = os.path.join(root, "split.json")
        n_train = max(1, len(files) - 2)
        with open(split_path, "w") as f:
            json.dump(
                {
                    "train": files[:n_train],
                    "test": files[n_train : len(files) - 1] or files[-1:],
                    "validation": files[-1:],
                },
                f,
            )
        exp = os.path.join(root, "exp")
        cwd = os.getcwd()
        try:
            tf.main(tf.build_parser().parse_args([
                "-exp", exp, "-arc", "BiLSTM",
                "-enc",
                "wav2vec/_mean_std" if os.environ.get("BENCH_CLI_MFCC") != "1" else "mfcc",
                "-ef", emb_dir,
                "-lf", os.path.join(lab_out, "labs_dict.pkl"),
                "-lr", "1e-3", "-bs", "2", "-max", "3", "-vp", "0.3", "-pat", "5",
                "-loss", "FocalLoss", "-s_last", "-split", split_path,
                "-hu", "32", "-nl", "1",
            ]))
        finally:
            os.chdir(cwd)

        def run(tag):
            pred_emb = os.path.join(root, f"pred_emb_{tag}")
            pred_exp = os.path.join(root, f"pred_exp_{tag}")
            t0 = time.time()
            predict_main([
                "-ee", "-ef", pred_emb, "-hyp", os.path.join(exp, "results.txt"),
                "-model", os.path.join(exp, "checkpoints", "best_model"),
                "-exp", pred_exp, "-af", audio_dir, "-ui", "1.0", "-th", "0.5",
            ])
            dt = time.time() - t0
            v = total_min / dt
            print(f"{tag}: {dt:.1f} s for {total_min} audio-min = "
                  f"{v:.2f} audio-min/s", file=sys.stderr, flush=True)
            return v

        cold = run("cold")   # includes every jit compile
        warm = run("warm")   # compiles cached in-process
        print(json.dumps({
            "metric": "predict_cli_audio_min_per_sec",
            "cold": round(cold, 2),
            "warm": round(warm, 2),
            "n_docs": n_docs,
            "doc_min": doc_min,
        }), flush=True)
    except BaseException:
        print(f"workdir kept for inspection: {root}", file=sys.stderr)
        raise
    else:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
