"""Audio IO: WAV + MP3 decode + resampling, with a native C++ fast path.

The reference loads audio through librosa/soundfile (libsndfile + soxr
native code, e.g. /root/reference/extract_embeddings.py:490-496), and its
mp3 support comes from librosa's audioread fallback delegating to a system
decoder. The same decision here:

- WAV (PCM/float) decodes through the C++ `runtime/` loader when built
  (mmap + SIMD-friendly int->float conversion + polyphase resample), with a
  scipy.io.wavfile fallback;
- MP3 (`extract_embeddings.py:207-224` pairs `.mp3/.wav` transcripts)
  decodes through SDL_mixer via pygame when installed — the exact
  third-party-decoder delegation the reference's audioread path makes —
  with a clear actionable error when no decoder is available;
- resampling to 16 kHz uses polyphase filtering (scipy.signal.resample_poly
  — same algorithm family as librosa's default).
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


# MP3s decode to this intermediate rate (SDL_mixer converts on load; 44.1 k
# is the native rate of nearly all broadcast mp3s, so the conversion is
# usually an identity), then our polyphase resampler takes it to target_sr
_MP3_DECODE_SR = 44100
# created eagerly: a lazy check-then-act would race when prefetch_audio's
# worker threads hit their first .mp3 files simultaneously
import threading as _threading  # noqa: E402

_mp3_lock = _threading.Lock()


def _decode_mp3(path: str) -> Tuple[np.ndarray, int]:
    """mp3 -> (mono float32, sr) via SDL_mixer (pygame).

    The reference's own mp3 support is the same delegation one level
    removed: librosa -> audioread -> a system decoder
    (extract_embeddings.py:490 loads whatever create_database paired at
    :207-224). SDL_mixer's decode is time-exact (duration is preserved
    across requested frequencies)."""
    try:
        os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
        import pygame
        import pygame.sndarray
    except ImportError as e:
        raise RuntimeError(
            f"{path}: mp3 decoding needs the 'pygame' package (SDL_mixer) "
            "or a prior conversion to wav (`ffmpeg -i in.mp3 out.wav`); "
            "neither ffmpeg nor pygame is available here."
        ) from e

    # pygame's mixer is process-global state; serialize decodes (the
    # prefetcher runs load_audio from worker threads)
    with _mp3_lock:
        if not pygame.mixer.get_init():
            pygame.mixer.init(frequency=_MP3_DECODE_SR, size=-16, channels=2)
        freq, _size, _ch = pygame.mixer.get_init()
        data = pygame.sndarray.array(pygame.mixer.Sound(path))
    return _to_float_mono(np.asarray(data)), freq


def load_audio(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """-> (mono float32 in [-1, 1] at target_sr, target_sr)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mp3":
        audio, sr = _decode_mp3(path)
        if sr != target_sr:
            audio = resample(audio, sr, target_sr)
        return audio.astype(np.float32), target_sr
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
