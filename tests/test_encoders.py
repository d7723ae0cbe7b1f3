"""Encoder architecture smoke tests (random-weight mode): shapes + batching."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def smoke_weights(monkeypatch):
    monkeypatch.setenv("MTS_RANDOM_ENCODER_WEIGHTS", "1")


def _audio(seconds=3, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(seconds * sr)).astype(np.float32)


def test_xvector_shapes():
    from multimodaltopicsegmentation_tpu.encoders.tdnn import XVectorEncoder

    enc = XVectorEncoder()
    audio = _audio(4)
    embs = enc.encode_document(audio, [(0, 16000), (16000, 32000), (32000, 64000)])
    assert len(embs) == 3
    assert all(e.shape == (512,) for e in embs)
    assert all(np.isfinite(e).all() for e in embs)


@pytest.mark.slow
def test_ecapa_shapes():
    from multimodaltopicsegmentation_tpu.encoders.tdnn import EcapaEncoder

    enc = EcapaEncoder()
    audio = _audio(2)
    embs = enc.encode_document(audio, [(0, 16000), (16000, 32000)])
    assert len(embs) == 2
    assert all(e.shape == (192,) for e in embs)


@pytest.mark.slow
def test_crepe_shapes():
    from multimodaltopicsegmentation_tpu.encoders.crepe import CrepeEncoder

    enc = CrepeEncoder()
    audio = _audio(2)
    embs = enc.encode_document(audio, [(0, 16000), (16000, 32000)])
    assert len(embs) == 2
    # 10 ms hop over 1 s -> ~94 frames of 256-d
    assert all(e.ndim == 2 and e.shape[1] == 256 for e in embs)
    assert embs[0].shape[0] > 50


def test_openl3_shapes():
    from multimodaltopicsegmentation_tpu.encoders.openl3 import OpenL3Encoder

    enc = OpenL3Encoder(n_mels=128)
    audio = _audio(3)
    embs = enc.encode_document(audio, [(0, 32000), (32000, 48000)])
    assert len(embs) == 2
    assert all(e.ndim == 2 and e.shape[1] == 512 for e in embs)
    # 2 s unit at 0.1 s hop -> ~11 windows
    assert embs[0].shape[0] >= 10


def test_build_encoder_dispatch():
    from types import SimpleNamespace

    from multimodaltopicsegmentation_tpu.encoders.engine import build_encoder

    enc = build_encoder(SimpleNamespace(mfcc=True))
    assert enc.name == "mfcc"
    enc = build_encoder(SimpleNamespace(prosodic_feats=True))
    assert enc.name == "prosodic"
    enc = build_encoder(SimpleNamespace())  # default -> x-vectors
    assert enc.name == "x-vectors"


def test_wav2vec2_explicit_weights_beat_random_mode(monkeypatch):
    """MTS_WAV2VEC2_WEIGHTS must win over MTS_RANDOM_ENCODER_WEIGHTS —
    same precedence as the crepe/openl3 hooks: a deployment that exports
    real weights is not silently degraded by a leftover smoke flag."""
    from multimodaltopicsegmentation_tpu.encoders import engine
    from multimodaltopicsegmentation_tpu.encoders import wav2vec2 as W

    seen = {}

    def fake_load(path, stacked=None):
        seen["path"] = path
        return {}, W.Wav2Vec2Config.base()

    monkeypatch.setattr(W, "load_pretrained", fake_load)
    monkeypatch.setenv("MTS_RANDOM_ENCODER_WEIGHTS", "1")
    monkeypatch.setenv("MTS_WAV2VEC2_WEIGHTS", "/some/ckpt")
    engine.Wav2Vec2Encoder()
    assert seen["path"] == "/some/ckpt"


def test_openl3_env_weights_are_variant_specific(monkeypatch):
    """The mel128 (training) and mel256 (inference) checkpoints are
    shape-compatible, so each variant must resolve its own env var before
    the generic fallback — a single path would cross-load silently."""
    from multimodaltopicsegmentation_tpu.encoders import openl3 as O

    seen = {}

    def fake_load(path, n_mels=128):
        seen[n_mels] = path
        return O.openl3_init(jax.random.PRNGKey(0), n_mels)

    monkeypatch.setattr(O, "load_weights", fake_load)
    monkeypatch.setenv("MTS_OPENL3_WEIGHTS", "/generic.npz")
    monkeypatch.setenv("MTS_OPENL3_WEIGHTS_MEL256", "/mel256.npz")
    O.OpenL3Encoder(n_mels=256)
    assert seen[256] == "/mel256.npz"
    O.OpenL3Encoder(n_mels=128)  # no MEL128 var -> generic fallback
    assert seen[128] == "/generic.npz"
