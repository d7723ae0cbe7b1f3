"""Frame-level extraction: pooling-variant dirs + engine chunking."""
import os
import pickle

import numpy as np
import pytest

import jax

from multimodaltopicsegmentation_tpu.cli.extract_embeddings import write_frame_level


def test_write_frame_level_layout(tmp_path):
    rng = np.random.default_rng(0)
    unit_frames = [rng.standard_normal((n, 6)).astype(np.float32) for n in (4, 7, 3)]
    write_frame_level(str(tmp_path), "docX", unit_frames)

    for d in ("_mean", "_max", "_mean_std", "_max_std", "_last", "_delta_gap", "_no_reduction"):
        assert os.path.exists(tmp_path / d)

    mean = np.load(tmp_path / "_mean" / "docX.npy")
    assert mean.shape == (3, 6)
    np.testing.assert_allclose(mean[1], unit_frames[1].mean(0), atol=1e-6)

    ms = np.load(tmp_path / "_mean_std" / "docX.npy")
    assert ms.shape == (3, 12)

    last = np.load(tmp_path / "_last" / "docX.npy")
    np.testing.assert_allclose(last[0], unit_frames[0][-1], atol=1e-6)

    dg = np.load(tmp_path / "_delta_gap" / "docX.npy")
    np.testing.assert_allclose(dg[0], unit_frames[1][0] - unit_frames[0][-1], atol=1e-6)
    np.testing.assert_allclose(dg[-1], unit_frames[-1][-1], atol=1e-6)

    with open(tmp_path / "_no_reduction" / "docX.pkl", "rb") as f:
        raw = pickle.load(f)
    assert len(raw) == 3 and raw[1].shape == (7, 6)


def test_wav2vec_engine_chunking(monkeypatch):
    """Chunked batched encode == per-unit frame counts, across chunk sizes."""
    monkeypatch.setenv("MTS_RANDOM_ENCODER_WEIGHTS", "1")
    from multimodaltopicsegmentation_tpu.encoders import wav2vec2 as W
    from multimodaltopicsegmentation_tpu.encoders.engine import Wav2Vec2Encoder

    enc = Wav2Vec2Encoder.__new__(Wav2Vec2Encoder)
    enc.cfg = W.Wav2Vec2Config.tiny()
    enc.params = W.init_params(jax.random.PRNGKey(0), enc.cfg)
    enc._apply = jax.jit(lambda p, a, l: W.apply(p, enc.cfg, a, l))
    enc._W = W

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(4000).astype(np.float32)
    bounds = [(0, 1000), (1000, 2500), (2500, 4000)]
    out1 = enc.encode_document(audio, bounds, chunk=2)  # tail: 1 row -> padded to 2
    out2 = enc.encode_document(audio, bounds, chunk=8)  # one call, 3 rows -> bucket 8
    assert len(out1) == 3
    for a, b, (s, e) in zip(out1, out2, bounds):
        assert a.shape == b.shape
        assert a.shape[0] == W.feature_extractor_output_length(enc.cfg, e - s)
        # zero-length bucket-padding rows must not perturb real units
        np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_continue_from_check_frame_level(tmp_path, monkeypatch):
    """--continue_from_check must recognize already-extracted documents for
    FRAME-LEVEL encoders, whose outputs live in the pooling subdirs."""
    from tests.test_audio_end_to_end import make_audio_corpus
    from multimodaltopicsegmentation_tpu.cli.extract_embeddings import (
        build_parser,
        main,
    )

    monkeypatch.setenv("MTS_RANDOM_ENCODER_WEIGHTS", "1")
    audio_dir, data_dir, lab_path = make_audio_corpus(str(tmp_path), n_docs=2)
    emb_dir = str(tmp_path / "emb")
    lab_out = str(tmp_path / "labs")
    argv = [
        "-data", data_dir, "-audio", audio_dir, "-od", emb_dir,
        "-lab", lab_path, "-lod", lab_out, "--wav2vec", "-vd", "-ui", "2.0",
        "-cont",
    ]
    main(build_parser().parse_args(argv))
    mean_dir = os.path.join(emb_dir, "_mean")
    first = {f: os.path.getmtime(os.path.join(mean_dir, f))
             for f in os.listdir(mean_dir)}
    assert first
    main(build_parser().parse_args(argv))  # second run: everything skipped
    second = {f: os.path.getmtime(os.path.join(mean_dir, f))
              for f in os.listdir(mean_dir)}
    assert first == second


def test_bucket_samples_grid():
    """Ragged doc maxes quantize STRICTLY up onto an O(log)-sized grid
    (every unit lands in the padded regime); uniform documents bypass
    bucketing entirely in pad_units (the 1-second-unit predict contract
    keeps its exact compiled shape)."""
    from multimodaltopicsegmentation_tpu.encoders.engine_util import (
        bucket_samples,
        pad_units,
    )

    # >= 4096 samples of guaranteed zero tail (STFT window + delta reach
    # of every masked-kept frame stays off the reflect boundary), within
    # 12.5% + one quantum above that, onto a shared grid
    for s in (3999, 4000, 4001, 9573, 16000, 17371, 111111):
        b = bucket_samples(s)
        assert b >= s + 4096 and b <= -(-(s + 4096) * 9) // 8 + 4000
    # grid is shared: everything in a bucket maps to one value
    assert bucket_samples(17000) == bucket_samples(17371)
    # the whole plausible VAD range (0.25 s .. 30 s) yields few programs
    grid = {bucket_samples(s) for s in range(4001, 480000, 997)}
    assert len(grid) < 45

    # uniform document: exact shape, no bucketing
    audio = np.zeros(64000, np.float32)
    u, l = pad_units(audio, [(0, 16000), (16000, 32000)], bucket=True)
    assert u.shape[1] == 16000
    # ragged document: bucketed above the max with headroom
    u, l = pad_units(audio, [(0, 9573), (9573, 27000)], bucket=True)
    assert u.shape[1] == bucket_samples(17427) >= 17427 + 4096


def test_mfcc_encoder_bucketing_invariance():
    """Within the padded regime the MFCC encoder's unit features are
    invariant to HOW FAR the S axis is bucket-padded (frame-masked
    features; the strict round-up puts every ragged unit there)."""
    from multimodaltopicsegmentation_tpu.encoders.engine import MFCCEncoder
    from multimodaltopicsegmentation_tpu.encoders import engine_util

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000 * 4).astype(np.float32) * 0.1
    bounds = [(0, 9573), (9573, 26000), (26000, 43371)]  # ragged; max 17371
    enc = MFCCEncoder()
    out_bucketed = enc.encode_document(audio, bounds)

    orig = engine_util.bucket_samples
    try:
        # a different (coarser) grid must not perturb any unit's features
        engine_util.bucket_samples = lambda S, sr=16000: orig(orig(S))
        out_coarser = enc.encode_document(audio, bounds)
    finally:
        engine_util.bucket_samples = orig
    for a, b in zip(out_bucketed, out_coarser):
        np.testing.assert_allclose(a, b, atol=2e-5)
