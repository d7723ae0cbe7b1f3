"""predict.py segment_audio span conversion vs the reference's loop semantics."""
import numpy as np

from multimodaltopicsegmentation_tpu.cli.predict import BasePredictor


def _mk(adapt, interval=1, sr=16000):
    p = BasePredictor()
    p.adapt = adapt
    p.interval = interval
    p.sr = sr
    return p


def test_uniform_spans_cover_audio():
    sr = 16000
    p = _mk(adapt=False, interval=1, sr=sr)
    audio = np.zeros(sr * 10, np.float32)
    segmentation = [0, 0, 1, 0, 0, 0, 1, 0, 0, 0]
    segs, x = p.segment_audio(None, segmentation, mock_audio=audio, mock_sr=sr)
    # boundaries after units 3 and 7 (1-indexed sample strides), plus the
    # reference's trailing catch-all span
    assert segs[0] == (0, 3 * sr)
    assert segs[1] == (3 * sr, 7 * sr)
    assert segs[-1][1] == len(audio)


def test_uniform_handles_short_segmentation():
    sr = 16000
    p = _mk(adapt=False, interval=1, sr=sr)
    audio = np.zeros(sr * 8, np.float32)
    # fewer predictions than strides: reference breaks out on IndexError
    segs, _ = p.segment_audio(None, [1, 0, 1], mock_audio=audio, mock_sr=sr)
    assert segs[0] == (0, sr)
    assert segs[1] == (sr, 3 * sr)
    assert segs[-1] == (3 * sr, len(audio))


def test_adaptive_spans():
    sr = 16000
    p = _mk(adapt=True, sr=sr)
    n = sr * 10
    audio = np.zeros(n, np.float32)
    segmentation = [0] * 100
    segmentation[24] = 1
    segmentation[49] = 1
    segs, _ = p.segment_audio(None, segmentation, mock_audio=audio, mock_sr=sr)
    stride = n // 100
    assert segs[0] == (0, 25 * stride)
    assert segs[1] == (25 * stride, 50 * stride)
