"""Batched unit-encoding engine.

The reference encodes one unit at a time through host-side encoder calls —
the dominant predict-path cost (extract_embeddings_inference.py:406-408,
serial joblib loop). Here a document's units are packed into padded [U, S]
device batches and encoded in a few jitted calls:

- unit-level encoders (prosodic 167-d, mfcc 200-d) run through the batched
  DSP front-end (dsp/prosody.py); prosodic chunks carry one unit of left
  context so pitch-jump chains survive chunking;
- frame-level encoders (wav2vec2) run the jitted transformer over unit
  chunks and slice each unit's valid frames.

Encoders with unavailable pretrained weights raise actionable errors unless
MTS_RANDOM_ENCODER_WEIGHTS=1 (smoke-test mode, clearly logged).
"""
from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .engine_util import bucket_rows as _bucket_rows
from .engine_util import pad_units as _pad_units

SR = 16000


class ProsodicEncoder:
    name = "prosodic"
    dim = 167
    frame_level = False

    def encode_document(self, audio, bounds, chunk=256):
        from ..dsp.prosody import prosodic_features

        units, lens = _pad_units(audio, bounds, bucket=True)
        outs = []
        i = 0
        while i < len(bounds):
            lo = max(i - 1, 0)  # one unit of left context for pitch jumps
            hi = min(i + chunk, len(bounds))
            # row-bucket (quantum 8: pyin's HMM is the costliest per-row
            # stage, so keep padded rows few) — O(1) compiled row shapes
            # per corpus; padded zero-length rows are dropped below
            u, l = _bucket_rows(units[lo:hi], lens[lo:hi], 8)
            feats = np.asarray(
                prosodic_features(jnp.asarray(u), jnp.asarray(l), SR)
            )[: hi - lo]
            outs.append(feats[i - lo :])
            i = hi
        return [f for f in np.concatenate(outs, axis=0)]


class MFCCEncoder:
    name = "mfcc"
    dim = 200
    frame_level = False

    def encode_document(self, audio, bounds, chunk=256):
        from ..dsp.prosody import mfcc_features

        units, lens = _pad_units(audio, bounds, bucket=True)
        outs = []
        for i in range(0, len(bounds), chunk):
            n = min(chunk, len(bounds) - i)
            u, l = _bucket_rows(units[i : i + chunk], lens[i : i + chunk], 32)
            feats = np.asarray(mfcc_features(jnp.asarray(u), jnp.asarray(l), SR))
            outs.append(feats[:n])
        return [f for f in np.concatenate(outs, axis=0)]


class Wav2Vec2Encoder:
    name = "wav2vec"
    dim = 768
    frame_level = True

    def __init__(self, name_or_path: str = "facebook/wav2vec2-base-960h",
                 expected_audio_min: float = None):
        from . import wav2vec2 as W

        # param-storage auto-selection: per-layer buffers only when the
        # corpus amortizes their extra cold compile (W.choose_stacked_storage;
        # MTS_W2V2_STACKED always wins). No hint -> env/stacked default.
        stacked = (
            W.choose_stacked_storage(expected_audio_min)
            if expected_audio_min is not None else None
        )
        # Precedence matches the crepe/openl3 hooks: EXPLICIT weights
        # (MTS_WAV2VEC2_WEIGHTS, a local HF checkpoint directory from
        # tools/convert_weights.py, for zero-egress hosts) always win over
        # the random-weight smoke mode — a deployment that exports real
        # weights must not be silently degraded by a leftover
        # MTS_RANDOM_ENCODER_WEIGHTS=1.
        weights = os.environ.get("MTS_WAV2VEC2_WEIGHTS") or None
        if weights is None and os.environ.get("MTS_RANDOM_ENCODER_WEIGHTS") == "1":
            print(
                "WARNING: MTS_RANDOM_ENCODER_WEIGHTS=1 — wav2vec2 runs with "
                "RANDOM weights (smoke-test mode, embeddings are meaningless)"
            )
            self.cfg = W.Wav2Vec2Config.base()
            self.params = W.init_params(jax.random.PRNGKey(0), self.cfg,
                                        stacked=stacked)
        else:
            self.params, self.cfg = W.load_pretrained(
                weights or name_or_path, stacked=stacked,
            )
        # params must be an ARGUMENT, not a closure: closed-over weights are
        # baked into the HLO as constants (385 MB for base — breaks the
        # remote-compile path and bloats every cache entry)
        self._apply = jax.jit(lambda p, a, l: W.apply(p, self.cfg, a, l))
        self._W = W

    def encode_document(self, audio, bounds, chunk=256):
        units, lens = _pad_units(audio, bounds, bucket=True)
        outs: List[np.ndarray] = []
        for i in range(0, len(bounds), chunk):
            nb = min(chunk, len(bounds) - i)
            # Bucket the ragged tail chunk up to a multiple of 32 rows so a
            # corpus compiles O(1) encoder programs instead of one per
            # distinct tail size — each extra compile of the wav2vec2
            # program costs 20 s to minutes on the remote-compile tunnel,
            # vs ~0.2 ms/row of padded compute.
            u, l = _bucket_rows(units[i : i + chunk], lens[i : i + chunk], 32,
                                cap=chunk)
            frames = np.asarray(
                self._apply(self.params, jnp.asarray(u), jnp.asarray(l))
            )[:nb]
            for row, n in zip(frames, lens[i : i + chunk]):
                t = self._W.feature_extractor_output_length(self.cfg, int(n))
                outs.append(row[: max(t, 1)])
        return outs


class _WeightlessEncoder:
    """Placeholder for encoders whose pretrained stacks cannot be fetched in
    this environment (x-vector/ECAPA via SpeechBrain, OpenL3 via TF, CREPE).
    The architectures live in encoders/tdnn.py / openl3.py; weight import
    hooks are documented there."""

    def __init__(self, name, dim, frame_level=False):
        self.name = name
        self.dim = dim
        self.frame_level = frame_level

    def encode_document(self, audio, bounds, chunk=256):
        if os.environ.get("MTS_RANDOM_ENCODER_WEIGHTS") != "1":
            raise RuntimeError(
                f"encoder '{self.name}' needs pretrained weights that are not "
                "available in this environment (no network egress). Use "
                "prosodic/mfcc (weight-free) or wav2vec with a local "
                "checkpoint, or set MTS_RANDOM_ENCODER_WEIGHTS=1 for a "
                "random-weight smoke test."
            )
        from .tdnn import RandomProjectionEncoder

        return RandomProjectionEncoder(self.dim, self.frame_level).encode_document(
            audio, bounds, chunk
        )


def build_encoder(args) -> object:
    """Encoder selection mirroring the reference's flag priority
    (extract_embeddings.py:140-197: ecapa > openl3 > prosodic > mfcc >
    wav2vec > CREPE > x-vectors default)."""
    if getattr(args, "ecapa", False):
        from .tdnn import EcapaEncoder

        return EcapaEncoder()
    if getattr(args, "openl3", False):
        from .openl3 import OpenL3Encoder

        # training used mel128/env, inference mel256/music
        # (extract_embeddings.py:147 vs extract_embeddings_inference.py:107)
        n_mels = 256 if getattr(args, "_inference_variant", False) else 128
        return OpenL3Encoder(n_mels=n_mels)
    if getattr(args, "prosodic_feats", False):
        return ProsodicEncoder()
    if getattr(args, "mfcc", False):
        return MFCCEncoder()
    if getattr(args, "wav2vec", False):
        return Wav2Vec2Encoder(
            expected_audio_min=getattr(args, "_expected_audio_min", None)
        )
    if getattr(args, "CREPE", False):
        from .crepe import CrepeEncoder

        return CrepeEncoder()
    from .tdnn import XVectorEncoder

    return XVectorEncoder()
