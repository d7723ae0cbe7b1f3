"""Energy VAD + create_vad_segments label alignment (the -vd default path)."""
import json
import os
import pickle

import numpy as np
import pytest

from multimodaltopicsegmentation_tpu.dsp.unitize import create_vad_segments
from multimodaltopicsegmentation_tpu.dsp.vad import speech_segments


def test_energy_vad_finds_speech_spans():
    sr = 16000
    rng = np.random.default_rng(0)
    # 1 s speech, 1 s silence, 2 s speech, 1 s silence
    def tone(secs, hz=220.0):
        t = np.arange(int(secs * sr)) / sr
        return (0.5 * np.sin(2 * np.pi * hz * t) + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    def silence(secs):
        return (0.001 * rng.standard_normal(int(secs * sr))).astype(np.float32)

    audio = np.concatenate([tone(1), silence(1), tone(2), silence(1)])
    spans = speech_segments(audio, sr)
    assert len(spans) == 2
    (s1, e1), (s2, e2) = spans
    assert s1 == pytest.approx(0.0, abs=0.15)
    assert e1 == pytest.approx(1.0, abs=0.2)
    assert s2 == pytest.approx(2.0, abs=0.2)
    assert e2 == pytest.approx(4.0, abs=0.2)


def test_create_vad_segments_label_alignment():
    # speechbrain-style (start, end) spans; topics end at t=2.5 and t=5.0
    segmentation = [(0.0, 1.0), (1.2, 2.0), (2.2, 3.0), (3.2, 4.0), (4.2, 5.0)]
    lab_times = [(0.0, 2.5), (2.5, 5.0)]
    segments, labs = create_vad_segments(segmentation, lab_times, speechbrain=True)
    # topic 1 spans the first 3 VAD units (unit 3 crosses t=2.5), topic 2 the rest
    assert labs == [0, 0, 1, 0, 1]
    assert len(segments) == 2
    assert len(segments[0]) == 3 and len(segments[1]) == 2


def test_create_vad_segments_trailing_units():
    # VAD spans continue past the final topic end-time: reference appends 0s
    # and forces a trailing 1
    segmentation = [(0.0, 1.0), (1.2, 2.0), (2.2, 3.0), (3.2, 4.0)]
    lab_times = [(0.0, 1.5)]
    segments, labs = create_vad_segments(segmentation, lab_times, speechbrain=True)
    assert len(labs) == len(segmentation)
    assert labs[-1] == 1
    assert labs[:2] == [0, 1]


def test_extract_cli_vad_path(tmp_path):
    """extract_embeddings with the (default) VAD unitization end to end."""
    from tests.test_audio_end_to_end import make_audio_corpus
    from multimodaltopicsegmentation_tpu.cli.extract_embeddings import (
        build_parser,
        main,
    )

    audio_dir, data_dir, lab_path = make_audio_corpus(str(tmp_path), n_docs=2)
    emb_dir = str(tmp_path / "emb")
    lab_out = str(tmp_path / "labs")
    # note: NOT passing -vd => VAD path (store_false flag)
    args = build_parser().parse_args([
        "-data", data_dir, "-audio", audio_dir, "-od", emb_dir,
        "-lab", lab_path, "-lod", lab_out, "--mfcc",
    ])
    main(args)
    files = [f for f in os.listdir(emb_dir) if f.endswith(".npy")]
    assert len(files) == 2
    with open(os.path.join(lab_out, "labs_dict.pkl"), "rb") as f:
        labs = pickle.load(f)
    for name, lab in labs.items():
        emb = np.load(os.path.join(emb_dir, name + ".npy"))
        assert emb.shape[0] == len(lab)
        assert sum(lab) >= 1
