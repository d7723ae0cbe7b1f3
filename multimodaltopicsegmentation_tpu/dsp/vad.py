"""Energy-based voice activity detection (jitted frame energies).

The reference's VAD options are SpeechBrain's neural VAD or the INA
segmenter (/root/reference/extract_embeddings.py:116-121) — external
pretrained stacks that are not available here. This module provides the
framework's built-in VAD: jitted log-mel energy + adaptive thresholding,
with the same output contract as the reference's `get_speech_segments`
(a list of (start_s, end_s) speech spans) so `create_vad_segments` label
alignment works unchanged. predict.py's default path never uses VAD
(uniform segmentation, predict.py:56-58), matching the reference.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import frame_signal


@partial(jax.jit, static_argnames=("sr", "frame_length", "hop"))
def frame_log_energy(y: jnp.ndarray, sr: int, frame_length: int = 400, hop: int = 160):
    """25 ms / 10 ms log frame energies."""
    frames = frame_signal(y, frame_length, hop, center=False)
    return jnp.log(jnp.mean(frames**2, axis=-1) + 1e-10)


def speech_segments(
    audio: np.ndarray,
    sr: int,
    min_speech_s: float = 0.25,
    min_gap_s: float = 0.3,
    threshold_offset_db: float = 6.0,
) -> list:
    """-> [(start_s, end_s)] speech spans.

    Threshold = noise floor (10th percentile of log energy) + offset; spans
    shorter than min_speech_s are dropped, gaps shorter than min_gap_s are
    bridged.
    """
    e = np.asarray(frame_log_energy(jnp.asarray(audio), sr))
    if len(e) == 0:
        return []
    floor = np.percentile(e, 10)
    offset = threshold_offset_db / 10.0 * np.log(10.0)
    if np.percentile(e, 95) - floor < offset:
        # flat energy profile: there is no silence to separate — all speech
        active = np.ones(len(e), dtype=bool)
    else:
        active = e > floor + offset

    hop_s = 160 / 16000 if sr == 16000 else 160 / sr
    spans = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            spans.append((start * hop_s, i * hop_s))
            start = None
    if start is not None:
        spans.append((start * hop_s, len(active) * hop_s))

    # bridge short gaps
    merged = []
    for s, t in spans:
        if merged and s - merged[-1][1] < min_gap_s:
            merged[-1] = (merged[-1][0], t)
        else:
            merged.append((s, t))
    return [(s, t) for s, t in merged if t - s >= min_speech_s]
