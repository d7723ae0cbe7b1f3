"""Shared unit-batching helpers for encoders."""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def pad_units(
    audio: np.ndarray, bounds: Sequence[Tuple[int, int]], max_len: int = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Slice [start, end) sample spans into one zero-padded [U, S] batch."""
    lens = [max(e - s, 1) for s, e in bounds]
    S = max_len or max(lens)
    out = np.zeros((len(bounds), S), np.float32)
    for i, (s, e) in enumerate(bounds):
        seg = audio[s:e][:S]
        out[i, : len(seg)] = seg
    return out, np.asarray([min(l, S) for l in lens], np.int32)
