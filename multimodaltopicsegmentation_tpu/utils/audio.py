"""Audio IO: WAV decode + resampling, with a native C++ fast path.

The reference loads audio through librosa/soundfile (libsndfile + soxr
native code, e.g. /root/reference/extract_embeddings.py:490-496). Neither
library nor any mp3 decoder ships in this image, so:

- WAV (PCM/float) decodes through the C++ `runtime/` loader when built
  (mmap + SIMD-friendly int->float conversion + polyphase resample), with a
  scipy.io.wavfile fallback;
- resampling to 16 kHz uses polyphase filtering (scipy.signal.resample_poly
  — same algorithm family as librosa's default);
- mp3 raises a clear actionable error (the reference corpora also ship wav).
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_native = None


def _load_native():
    global _native
    if _native is None:
        from ..runtime import audio_native

        _native = audio_native if audio_native.available() else False
    return _native


def load_audio(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """-> (mono float32 in [-1, 1] at target_sr, target_sr)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mp3":
        raise RuntimeError(
            f"{path}: mp3 decoding requires ffmpeg, which is not available in "
            "this environment. Convert to wav (e.g. `ffmpeg -i in.mp3 out.wav`) "
            "before extraction."
        )
    if ext != ".wav":
        raise ValueError(f"unsupported audio format: {path}")

    native = _load_native()
    if native:
        audio, sr = native.read_wav(path)
    else:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        audio = _to_float_mono(data)
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
    return audio.astype(np.float32), target_sr


def _to_float_mono(data: np.ndarray) -> np.ndarray:
    # scale by the INTEGER dtype first: channel averaging promotes to
    # float64 and would silently skip the scaling for multi-channel files
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return data


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target_sr)
    return resample_poly(audio, target_sr // g, sr // g).astype(np.float32)


def save_wav(path: str, audio: np.ndarray, sr: int):
    from scipy.io import wavfile

    wavfile.write(path, sr, audio)


def prefetch_audio(paths, target_sr: int = 16000, window: int = 2):
    """Yield (path, audio, sr) with decode/resample overlapped ahead of the
    consumer (the extract pipeline encodes document i on the TPU while
    documents i+1..i+window decode on host threads — the C ABI loader and
    scipy both release the GIL)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=window) as pool:
        futures = []
        paths = list(paths)
        for i, p in enumerate(paths[: window + 1]):
            futures.append(pool.submit(load_audio, p, target_sr))
        for i, p in enumerate(paths):
            audio, sr = futures[i].result()
            nxt = i + window + 1
            if nxt < len(paths):
                futures.append(pool.submit(load_audio, paths[nxt], target_sr))
            yield p, audio, sr
