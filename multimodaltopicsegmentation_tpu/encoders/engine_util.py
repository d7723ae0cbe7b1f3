"""Shared unit-batching helpers for encoders."""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def bucket_samples(S: int, sr: int = 16000) -> int:
    """Round a ragged document's max unit length STRICTLY up onto a 9/8
    geometric grid, so a corpus compiles O(log) distinct encoder programs
    instead of one per document (each extra wav2vec2 compile costs 20 s to
    minutes on the remote-compile tunnel, vs ≤12.5% padded masked compute).
    Strictly greater on purpose: with S_q > max(lens) EVERY unit sits in
    the padded regime, whose length-masked features are exactly invariant
    to further zero tail — whereas an exactly-fitting longest unit takes
    the STFT edge path and would shift when the grid changes."""
    q = sr // 4
    b = q
    while b <= S:
        b = -(-b * 9) // 8
    return b


def pad_units(
    audio: np.ndarray, bounds: Sequence[Tuple[int, int]], max_len: int = None,
    bucket: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Slice [start, end) sample spans into one zero-padded [U, S] batch.

    bucket=True quantizes S via `bucket_samples` for RAGGED documents —
    safe only for consumers whose features are length-masked. Uniform
    documents (all unit lengths equal, e.g. the 1-second-unit predict
    contract) keep their exact shape: it is already stable across the
    corpus, and their units intentionally stay on the unpadded STFT edge
    path the reference's per-unit computation uses."""
    lens = [max(e - s, 1) for s, e in bounds]
    S = max_len or max(lens)
    if bucket and max_len is None and len(set(lens)) > 1:
        S = bucket_samples(S)
    out = np.zeros((len(bounds), S), np.float32)
    for i, (s, e) in enumerate(bounds):
        seg = audio[s:e][:S]
        out[i, : len(seg)] = seg
    return out, np.asarray([min(l, S) for l in lens], np.int32)
