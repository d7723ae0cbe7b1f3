"""Jitted spectral front-end: STFT, mel spectrogram, MFCC, deltas.

Replaces the reference's librosa/numba DSP calls
(/root/reference/extract_acoustic_features.py:58-117) with batched jitted
JAX: framing is a strided gather, the STFT is an rfft over frames, the mel
projection is ONE matmul with a precomputed (Slaney) filterbank, and the
DCT for MFCCs is another matmul — all MXU work.

Conventions follow librosa defaults so feature semantics match the
reference: hann window (periodic), n_fft=2048, hop=512, centered reflect
padding, power-2 spectrogram, Slaney-normalized mel bank (htk=False),
power_to_db with ref=1.0 and top_db=80, DCT-II orthonormal over the mel
axis. Delta features use the Savitzky-Golay order-1 derivative (width 9),
implemented as the closed-form slope FIR with edge replication (librosa's
'interp' edge mode differs only at the first/last 4 frames).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    """Periodic (sym=False) hann, matching scipy.signal.get_window('hann')."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int, center: bool = True):
    """[N] -> [n_frames, frame_length] with centered reflect padding."""
    if center:
        pad = frame_length // 2
        y = jnp.pad(y, (pad, pad), mode="reflect")
    n_frames = 1 + (y.shape[0] - frame_length) // hop
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[idx]


def stft_power(y: jnp.ndarray, n_fft: int = 2048, hop: int = 512) -> jnp.ndarray:
    """Power spectrogram [n_freqs, n_frames] (librosa |stft|^2 layout)."""
    frames = frame_signal(y, n_fft, hop)
    win = jnp.asarray(hann_window(n_fft), y.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.transpose(jnp.abs(spec) ** 2)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax=None) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (librosa htk=False)."""
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        f = np.asanyarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)

    def mel_to_hz(m):
        m = np.asanyarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)

    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def melspectrogram(
    y: jnp.ndarray, sr: int, n_mels: int = 128, n_fft: int = 2048, hop: int = 512
) -> jnp.ndarray:
    """[n_mels, n_frames] power mel spectrogram."""
    S = stft_power(y, n_fft, hop)
    bank = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return bank @ S


def power_to_db(S: jnp.ndarray, top_db: float = 80.0) -> jnp.ndarray:
    mag = jnp.maximum(S, 1e-10)
    db = 10.0 * jnp.log10(mag)
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def dct_ii_ortho_matrix(n: int) -> np.ndarray:
    """[n, n] orthonormal DCT-II matrix (scipy.fft.dct norm='ortho')."""
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * j + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


def mfcc(y: jnp.ndarray, sr: int, n_mfcc: int = 20, n_mels: int = 128,
         n_fft: int = 2048, hop: int = 512) -> jnp.ndarray:
    """[n_mfcc, n_frames], librosa.feature.mfcc semantics."""
    S = power_to_db(melspectrogram(y, sr, n_mels, n_fft, hop))
    D = jnp.asarray(dct_ii_ortho_matrix(n_mels)[:n_mfcc])
    return D @ S


def delta(x: jnp.ndarray, width: int = 9) -> jnp.ndarray:
    """Savitzky-Golay order-1 first derivative over the last axis.

    Interior points match scipy.signal.savgol_filter(polyorder=1, deriv=1)
    exactly: the regression-slope FIR c_k = k / sum(k^2), k in
    [-(w//2), w//2]. Edges replicate the boundary value (librosa 'interp'
    fits polynomials there instead; the difference touches only w//2 frames
    per side and washes out in unit-level statistics).
    """
    half = width // 2
    k = np.arange(-half, half + 1, dtype=np.float32)
    coeffs = k / np.sum(k**2)
    xp = jnp.concatenate(
        [jnp.repeat(x[..., :1], half, axis=-1), x, jnp.repeat(x[..., -1:], half, axis=-1)],
        axis=-1,
    )
    # correlation with the slope kernel
    out = jnp.zeros_like(x)
    for i, c in enumerate(coeffs):
        out = out + c * xp[..., i : i + x.shape[-1]]
    return out
