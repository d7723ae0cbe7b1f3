"""YIN fundamental-frequency estimation with voicing intensity, jitted.

The reference's prosodic features come from a modified librosa pyin that
also returns a per-frame voicing intensity
(/root/reference/extract_acoustic_features.py:1-10,75), thresholded at 0.5
to detect pauses. Here:

- the YIN difference function is computed for all frames at once via the
  standard cumulative-energy + FFT-autocorrelation identity
  d[tau] = r[0] + r_tau[0] - 2*acf[tau] (one batched rfft — no numba),
- CMNDF normalization, absolute threshold trough selection and parabolic
  interpolation follow the YIN paper (de Cheveigne & Kawahara 2002),
- voicing intensity uses pyin's observation probability in closed form:
  pyin sweeps a Beta(2, 18) prior over YIN thresholds and credits a frame
  as voiced when any trough falls below the sampled threshold (librosa
  _pyin_helper); summed over thresholds that is exactly
      voiced_prob = 1 - (1 - no_trough_prob) * BetaCDF_{2,18}(min CMNDF)
  with no_trough_prob = 0.01 — one betainc call per frame, no HMM loop.
  f0 is NaN for frames below 0.5 voicing, like pyin's unvoiced output.

Everything is [n_frames, ...] batched; tau search ranges are static from
(fmin, fmax).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import frame_signal


def cmndf_band(frames: jnp.ndarray, sr: int, fmin: float, fmax: float):
    """Cumulative-mean-normalized difference function over framed audio.

    Shared by yin() and dsp/pyin.pyin() (both trackers normalize the same
    difference function). Returns (cmndf [T, W//2+1], band
    [T, tau_max-tau_min], tau_min, tau_max).
    """
    T, W = frames.shape
    tau_min = max(int(sr / fmax), 1)
    tau_max = min(int(sr / fmin) + 1, W // 2)

    # difference function via autocorrelation:
    # d[tau] = sum_{j<W-tau} (x_j - x_{j+tau})^2
    #        = e[W-tau-1] + (E - e[tau-1]) - 2*acf[tau]   (windowed halves)
    n_fft = int(2 ** np.ceil(np.log2(2 * W)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft, axis=-1)[:, : W // 2 + 1]

    sq = frames**2
    csum = jnp.cumsum(sq, axis=-1)  # e[k] = sum_{j<=k} x_j^2
    total = csum[:, -1:]
    taus = np.arange(0, W // 2 + 1)
    # energy of x[0 : W-tau] and x[tau : W]
    e_head = csum[:, W - 1 - taus]
    e_tail = total - jnp.where(taus > 0, csum[:, np.maximum(taus - 1, 0)], 0.0)
    d = e_head + e_tail - 2.0 * acf
    d = jnp.maximum(d, 0.0)

    # cumulative mean normalized difference
    cum = jnp.cumsum(d[:, 1:], axis=-1)
    tau_range = jnp.asarray(np.arange(1, W // 2 + 1), d.dtype)
    cmndf = jnp.concatenate(
        [jnp.ones((T, 1), d.dtype), d[:, 1:] * tau_range / jnp.maximum(cum, 1e-12)],
        axis=-1,
    )
    # zero-energy frames are 0/0 -> 0 "perfect periodicity"; force aperiodic
    cmndf = jnp.where(total > 1e-10, cmndf, 1.0)
    return cmndf, cmndf[:, tau_min:tau_max], tau_min, tau_max


def select_f0(cmndf: jnp.ndarray, band: jnp.ndarray, tau_min: int, sr: int,
              threshold: float = 0.1):
    """YIN trough selection + closed-form pyin voicing on a CMNDF band.

    Returns (f0 [T] — defined for EVERY frame, no voicing mask — and
    voicing [T]). Shared by yin() and pyin(with_raw_yin=True)."""
    T, n_tau = band.shape
    W2 = cmndf.shape[1] - 1  # = W // 2

    # YIN absolute threshold: first crossing below threshold, then descend
    # to the local minimum of that trough; fall back to the global min
    below = band < threshold
    first_below = jnp.argmax(below, axis=-1)
    any_below = jnp.any(below, axis=-1)
    nxt = jnp.concatenate(
        [band[:, 1:], jnp.full((T, 1), jnp.inf, band.dtype)], axis=-1
    )
    pos = jnp.asarray(np.arange(n_tau))
    at_local_min = (band <= nxt) & (pos[None, :] >= first_below[:, None])
    trough = jnp.argmax(at_local_min, axis=-1)
    global_min = jnp.argmin(band, axis=-1)
    tau_idx = jnp.where(any_below, trough, global_min)

    # parabolic interpolation around the chosen trough
    tau_abs = tau_idx + tau_min
    ym1 = jnp.take_along_axis(cmndf, jnp.maximum(tau_abs - 1, 1)[:, None], axis=1)[:, 0]
    y0 = jnp.take_along_axis(cmndf, tau_abs[:, None], axis=1)[:, 0]
    yp1 = jnp.take_along_axis(
        cmndf, jnp.minimum(tau_abs + 1, W2)[:, None], axis=1
    )[:, 0]
    denom = 2.0 * (ym1 - 2.0 * y0 + yp1)
    shift = jnp.where(jnp.abs(denom) > 1e-12, (ym1 - yp1) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    tau_refined = tau_abs.astype(band.dtype) + shift

    f0 = sr / jnp.maximum(tau_refined, 1e-6)
    # pyin voiced probability, closed form over the Beta(2,18) threshold prior
    min_cmndf = jnp.clip(jnp.min(band, axis=-1), 0.0, 1.0)
    no_trough_prob = 0.01
    cdf = jax.scipy.special.betainc(2.0, 18.0, min_cmndf)
    voicing = 1.0 - (1.0 - no_trough_prob) * cdf
    return f0, voicing


@partial(jax.jit, static_argnames=(
    "sr", "fmin", "fmax", "frame_length", "hop", "threshold", "mask_unvoiced"))
def yin(
    y: jnp.ndarray,
    sr: int,
    fmin: float = 70.0,
    fmax: float = 500.0,
    frame_length: int = 2048,
    hop: int = 512,
    threshold: float = 0.1,
    mask_unvoiced: bool = True,
):
    """Returns (f0 [n_frames], voicing [n_frames]).

    mask_unvoiced=True NaNs f0 below 0.5 voicing like pyin's unvoiced
    output; False returns the raw track defined at every frame — the
    reference's plain librosa.yin semantics (never NaN), which the
    prosodic pitch-jump chain requires (extract_embeddings.py:523,529)."""
    frames = frame_signal(y, frame_length, hop)  # [T, W]
    cmndf, band, tau_min, _tau_max = cmndf_band(frames, sr, fmin, fmax)
    f0, voicing = select_f0(cmndf, band, tau_min, sr, threshold)
    if mask_unvoiced:
        f0 = jnp.where(voicing >= 0.5, f0, jnp.nan)
    return f0, voicing
