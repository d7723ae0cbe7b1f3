"""Shared unit-batching helpers for encoders."""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def bucket_samples(S: int, sr: int = 16000) -> int:
    """Round a ragged document's max unit length up onto a 9/8 geometric
    grid — with >= HEADROOM samples of zero tail — so a corpus compiles
    O(log) distinct encoder programs instead of one per document (each
    extra wav2vec2 compile costs 20 s to minutes on the remote-compile
    tunnel, vs ≤12.5% padded masked compute).

    The headroom (not merely "strictly greater") puts EVERY unit deep in
    the padded regime: 4096 >= n_fft/2 + the delta filter's reach x hop,
    so the centered STFT windows and delta neighborhoods of every frame
    a length mask keeps read only zeros, never the reflect boundary —
    making the masked spectral features (MFCC/fbank/wav2vec2) exactly
    invariant to the grid choice (tested). pyin-based prosodic features
    are the one approximate case: the HMM Viterbi decode is global over
    the padded track, so f0 at valid frames can shift with tail length —
    the same dependence the pre-bucketing code already had (units were
    padded to the DOCUMENT max), not a new one."""
    q = sr // 4
    headroom = 4096
    b = q
    while b < S + headroom:
        b = -(-b * 9) // 8
    return b


def bucket_rows(u: np.ndarray, l: np.ndarray = None, quantum: int = 32,
                cap: int = None):
    """Zero-pad the ROW (unit/window-count) axis up to a multiple of
    `quantum` (optionally capped, e.g. at the full chunk size) so a
    corpus's ragged tail chunks compile O(1) row shapes instead of one
    program per distinct tail size. Padded rows have length 0 (when a
    lens vector `l` is threaded) or are all-zero windows — either way
    finite and row-independent — and callers drop them by slicing the
    result to the real row count."""
    nb = u.shape[0]
    nbb = quantum * (-(-nb // quantum))
    if cap is not None:
        nbb = min(cap, nbb)
    if nbb == nb:
        return u, l
    u = np.concatenate([u, np.zeros((nbb - nb, *u.shape[1:]), u.dtype)])
    if l is not None:
        l = np.concatenate([l, np.zeros((nbb - nb,), l.dtype)])
    return u, l


def pad_units(
    audio: np.ndarray, bounds: Sequence[Tuple[int, int]], max_len: int = None,
    bucket: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Slice [start, end) sample spans into one zero-padded [U, S] batch.

    bucket=True quantizes S via `bucket_samples` for RAGGED documents —
    safe only for consumers whose features are length-masked (see the
    pyin caveat on bucket_samples). Uniform documents (all unit lengths
    equal, e.g. the 1-second-unit predict contract) keep their exact
    shape: it is already stable across the corpus, and their units
    intentionally stay on the unpadded STFT edge path the reference's
    per-unit computation uses."""
    lens = [max(e - s, 1) for s, e in bounds]
    S = max_len or max(lens)
    if bucket and max_len is None and len(set(lens)) > 1:
        S = bucket_samples(S)
    out = np.zeros((len(bounds), S), np.float32)
    for i, (s, e) in enumerate(bounds):
        seg = audio[s:e][:S]
        out[i, : len(seg)] = seg
    return out, np.asarray([min(l, S) for l in lens], np.int32)
