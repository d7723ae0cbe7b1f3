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


# ---- speechbrain get_speech_segments postprocess contract ------------------
from multimodaltopicsegmentation_tpu.dsp.vad import (  # noqa: E402
    apply_threshold,
    double_check_speech_segments,
    energy_double_check,
    get_speech_segments,
    get_speech_segments_quartered,
    merge_close_segments,
    remove_short_segments,
)


def _tone(secs, sr=16000, hz=220.0, amp=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def _silence(secs, sr=16000, seed=1):
    rng = np.random.default_rng(seed)
    return (0.001 * rng.standard_normal(int(secs * sr))).astype(np.float32)


def test_apply_threshold_hysteresis():
    post = np.array([0.1, 0.6, 0.4, 0.3, 0.2, 0.6, 0.1])
    active = apply_threshold(post, activation_th=0.5, deactivation_th=0.25)
    # turns on at 0.6, SURVIVES the 0.4/0.3 dip (above deactivation), dies
    # at 0.2, reactivates at the second 0.6
    assert active.tolist() == [False, True, True, True, False, True, False]


def test_merge_close_and_remove_short():
    spans = [(0.0, 1.0), (1.1, 2.0), (2.6, 2.7), (3.5, 4.5)]
    merged = merge_close_segments(spans, close_th=0.250)
    assert merged == [(0.0, 2.0), (2.6, 2.7), (3.5, 4.5)]
    kept = remove_short_segments(merged, len_th=0.250)
    assert kept == [(0.0, 2.0), (3.5, 4.5)]


def test_energy_double_check_splits_internal_silence():
    """A candidate span bridging speech-silence-speech must split at the
    low-energy interior when the energy VAD is applied."""
    sr = 16000
    audio = np.concatenate([_tone(1.0), _silence(0.8), _tone(1.0)])
    spans = energy_double_check(audio, sr, [(0.0, 2.8)])
    assert len(spans) >= 2
    # first sub-span ends near 1.0 s, a later one starts near 1.8 s
    assert spans[0][1] == pytest.approx(1.0, abs=0.2)
    assert any(abs(s - 1.8) < 0.25 for s, _t in spans[1:])


def test_double_check_drops_low_posterior_span():
    post = np.concatenate([np.full(100, 0.9), np.full(100, 0.1)])
    spans = [(0.0, 1.0), (1.0, 2.0)]
    assert double_check_speech_segments(spans, post, speech_th=0.5) == [(0.0, 1.0)]


def test_get_speech_segments_pipeline():
    sr = 16000
    audio = np.concatenate([
        _tone(1.0), _silence(1.0), _tone(0.1), _silence(1.0), _tone(2.0),
    ])
    spans = get_speech_segments(audio, sr, apply_energy_VAD=True)
    # the 0.1 s blip must be dropped (len_th=0.25); two real spans remain
    assert len(spans) == 2
    assert spans[0][0] == pytest.approx(0.0, abs=0.2)
    assert spans[0][1] == pytest.approx(1.0, abs=0.25)
    assert spans[1][0] == pytest.approx(3.1, abs=0.3)
    assert spans[1][1] == pytest.approx(5.1, abs=0.3)


def test_get_speech_segments_quartered_offsets():
    """The MemoryError fallback runs per quarter and offsets spans by the
    quarter start (reference extract_embeddings.py:314-369)."""
    sr = 16000
    # 8 s total -> 2 s quarters; speech only in the 2nd and 4th quarters
    audio = np.concatenate([
        _silence(2.0), _tone(2.0, hz=300.0), _silence(2.0), _tone(2.0, hz=150.0),
    ])
    spans = get_speech_segments_quartered(audio, sr, n_parts=4, apply_energy_VAD=False)
    whole = get_speech_segments(audio, sr, apply_energy_VAD=False)
    assert len(spans) == 2
    for (qs, qe), (ws, we) in zip(spans, whole):
        assert qs == pytest.approx(ws, abs=0.3)
        assert qe == pytest.approx(we, abs=0.3)
    assert spans[0][0] == pytest.approx(2.0, abs=0.3)
    assert spans[1][0] == pytest.approx(6.0, abs=0.3)


def test_energy_fallback_warns_once(monkeypatch, capsys):
    """VAD without MTS_VAD_WEIGHTS must say loudly (once) that it is NOT the
    reference's SpeechBrain CRDNN posterior (round-2 review item)."""
    from multimodaltopicsegmentation_tpu.dsp import vad as vad_mod

    monkeypatch.delenv("MTS_VAD_WEIGHTS", raising=False)
    monkeypatch.setattr(vad_mod, "_warned_fallback", False)
    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    vad_mod.default_posteriors(audio, 16000)
    err = capsys.readouterr().err
    assert "MTS_VAD_WEIGHTS" in err and "energy-logistic" in err
    # second call: silent
    vad_mod.default_posteriors(audio, 16000)
    assert "MTS_VAD_WEIGHTS" not in capsys.readouterr().err
