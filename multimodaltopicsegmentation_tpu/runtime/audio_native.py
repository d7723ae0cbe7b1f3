"""ctypes bindings for the native C++ audio loader (see audio_native.cpp).

Builds lazily with `make` on first use if a compiler is available; falls
back cleanly (available() == False) otherwise — callers then use the scipy
path in utils/audio.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmts_audio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _HERE, "-s"], check=True, capture_output=True
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return _lib
    lib.mts_read_wav.restype = ctypes.POINTER(ctypes.c_float)
    lib.mts_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.mts_resample.restype = ctypes.POINTER(ctypes.c_float)
    lib.mts_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mts_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.mts_read_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def read_wav(path: str, target_sr: int = 0):
    """-> (float32 mono samples, sample_rate). target_sr=0 keeps native rate."""
    lib = _load()
    if not lib:
        raise RuntimeError("native audio library unavailable")
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    buf = lib.mts_read_wav(path.encode(), ctypes.byref(n), ctypes.byref(sr), target_sr)
    if not buf:
        raise RuntimeError(f"failed to read wav: {path}")
    try:
        out = np.ctypeslib.as_array(buf, shape=(n.value,)).copy()
    finally:
        lib.mts_free(buf)
    return out, sr.value


def read_wav_batch(paths, target_sr: int = 0):
    """Decode + resample many wavs concurrently (OpenMP across files).

    -> list of (samples, sample_rate); failed files yield (None, 0).
    """
    lib = _load()
    if not lib:
        raise RuntimeError("native audio library unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outputs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    srs = (ctypes.c_int * n)()
    lib.mts_read_wav_batch(c_paths, n, target_sr, outputs, lens, srs)
    results = []
    for i in range(n):
        if not outputs[i]:
            results.append((None, 0))
            continue
        try:
            arr = np.ctypeslib.as_array(outputs[i], shape=(lens[i],)).copy()
        finally:
            lib.mts_free(outputs[i])
        results.append((arr, srs[i]))
    return results


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    if not lib:
        raise RuntimeError("native audio library unavailable")
    audio = np.ascontiguousarray(audio, np.float32)
    n_out = ctypes.c_int64()
    buf = lib.mts_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(audio),
        sr_in,
        sr_out,
        ctypes.byref(n_out),
    )
    if not buf:
        raise RuntimeError("native resample failed")
    try:
        return np.ctypeslib.as_array(buf, shape=(n_out.value,)).copy()
    finally:
        lib.mts_free(buf)
