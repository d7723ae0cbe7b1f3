"""Probabilistic YIN (pyin) with on-device HMM Viterbi pitch tracking.

librosa-parity implementation of the reference's f0 source
(extract_acoustic_features.py:75 calls librosa.pyin(fmin=70, fmax=500)):

1. CMNDF per frame (FFT-autocorrelation, from dsp/yin.py's difference fn);
2. trough candidates = local minima over the lag band, parabolic-refined;
3. observation probabilities: a Beta(2, 18) prior sweeps 100 YIN
   thresholds; for each threshold the below-threshold troughs share mass
   under a Boltzmann(lambda=2) position prior; thresholds with no trough
   credit the global minimum with no_trough_prob = 0.01
   (librosa _pyin_helper semantics, fully vectorized);
4. candidates map to 0.1-semitone pitch bins; unvoiced states share the
   leftover mass uniformly;
5. Viterbi over 2*n_bins states (voiced/unvoiced x pitch) with librosa's
   transition structure — triangular local pitch transitions (max
   35.92 octaves/s) Kronecker a 2-state voicing loop (switch_prob 0.01) —
   as a lax.scan with an on-device backtrace (same pattern as ops/crf.py,
   ~680 states instead of 4).

Returns (f0 bin frequencies with NaN when unvoiced, voiced_flag,
voiced_prob), the librosa.pyin tuple.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .spectral import frame_signal
from .yin import cmndf_band, select_f0

N_THRESHOLDS = 100
BETA_A, BETA_B = 2.0, 18.0
BOLTZMANN_LAMBDA = 2.0
NO_TROUGH_PROB = 0.01
SWITCH_PROB = 0.01
MAX_TRANSITION_RATE = 35.92  # octaves / second
RESOLUTION = 0.1  # semitones per pitch bin
NEG = -1e30


def _beta_masses() -> np.ndarray:
    from scipy.stats import beta as beta_dist

    edges = np.linspace(0, 1, N_THRESHOLDS + 1)
    cdf = beta_dist.cdf(edges, BETA_A, BETA_B)
    return np.diff(cdf).astype(np.float32)  # [100]


def _pitch_bins(fmin: float, fmax: float):
    n_octaves = math.log2(fmax / fmin)
    n_bins = int(np.floor(12 * n_octaves / RESOLUTION)) + 1
    freqs = fmin * 2.0 ** (np.arange(n_bins) * RESOLUTION / 12.0)
    return n_bins, freqs.astype(np.float32)


def _transition_log(n_bins: int, sr: int, hop: int) -> np.ndarray:
    """log transition matrix [2n, 2n] (voiced block first), librosa layout."""
    max_semitones = round(MAX_TRANSITION_RATE * 12 * hop / sr)
    width = int(max_semitones / RESOLUTION) + 1
    # triangular local transition over pitch bins
    local = np.zeros((n_bins, n_bins), np.float64)
    half = width // 2
    offs = np.arange(-half, half + 1)
    tri = 1.0 + half - np.abs(offs)
    for i in range(n_bins):
        j = i + offs
        ok = (j >= 0) & (j < n_bins)
        local[i, j[ok]] = tri[ok]
        local[i] /= local[i].sum()
    t_switch = np.array([[1 - SWITCH_PROB, SWITCH_PROB], [SWITCH_PROB, 1 - SWITCH_PROB]])
    full = np.kron(t_switch, local)
    return np.log(np.maximum(full, 1e-30)).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=(
        "sr", "fmin", "fmax", "frame_length", "hop", "max_troughs",
        "with_raw_yin",
    ),
)
def pyin(
    y: jnp.ndarray,
    sr: int,
    fmin: float = 70.0,
    fmax: float = 500.0,
    frame_length: int = 2048,
    hop: int = 512,
    max_troughs: int = 128,
    with_raw_yin: bool = False,
):
    """with_raw_yin=True appends a 4th output: the plain-YIN f0 track
    (defined at every frame, no voicing mask) selected from the SAME
    CMNDF — the prosodic pitch-jump chain needs both tracks and this
    avoids a second framing+FFT pass (dsp/prosody.per_unit)."""
    frames = frame_signal(y, frame_length, hop)
    T, W = frames.shape

    # ---- CMNDF (shared with dsp/yin.py) ------------------------------------
    cmndf, band, tau_min, tau_max = cmndf_band(frames, sr, fmin, fmax)
    n_tau = tau_max - tau_min

    # ---- trough candidates (local minima, parabolic-refined) --------------
    # librosa localmin semantics: x < left AND x <= right, never a trough at
    # index 0 (left edge pads -inf so the strict test fails there; right edge
    # mirrors librosa's edge padding). The previous <=/< mirror picked a
    # different lag on plateaus and synthesized a phantom trough on constant
    # (zero-energy) frames.
    left = jnp.concatenate([jnp.full((T, 1), -jnp.inf), band[:, :-1]], axis=1)
    right = jnp.concatenate([band[:, 1:], band[:, -1:]], axis=1)
    is_trough = (band < left) & (band <= right)

    # keep up to max_troughs troughs per frame, in tau order
    order_key = jnp.where(is_trough, jnp.arange(n_tau)[None, :], n_tau + 1)
    sel = jnp.argsort(order_key, axis=1)[:, :max_troughs]  # [T, K] tau indices
    valid = jnp.take_along_axis(is_trough, sel, axis=1)

    v0 = jnp.take_along_axis(band, sel, axis=1)
    ym1 = jnp.take_along_axis(
        cmndf, jnp.maximum(sel + tau_min - 1, 1), axis=1
    )
    yp1 = jnp.take_along_axis(
        cmndf, jnp.minimum(sel + tau_min + 1, W // 2), axis=1
    )
    denom = 2.0 * (ym1 - 2.0 * v0 + yp1)
    shift = jnp.where(jnp.abs(denom) > 1e-12, (ym1 - yp1) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    heights = v0 - 0.25 * (ym1 - yp1) * shift  # interpolated trough value
    heights = jnp.clip(heights, 0.0, None)
    tau_ref = sel.astype(band.dtype) + tau_min + shift
    cand_freq = sr / jnp.maximum(tau_ref, 1e-6)  # [T, K]

    # ---- beta-threshold x boltzmann-position observation mass -------------
    beta_m = jnp.asarray(_beta_masses())  # [S]
    thresholds = jnp.asarray(
        np.linspace(0, 1, N_THRESHOLDS + 1)[1:].astype(np.float32)
    )  # [S]
    below = (heights[:, None, :] < thresholds[None, :, None]) & valid[:, None, :]
    # position rank among below-threshold troughs (tau order)
    pos = jnp.cumsum(below, axis=2) - 1  # [T, S, K]
    n_below = jnp.sum(below, axis=2)  # [T, S]
    lam = BOLTZMANN_LAMBDA
    boltz = (
        (1 - jnp.exp(-lam))
        * jnp.exp(-lam * pos)
        / jnp.maximum(1 - jnp.exp(-lam * n_below[:, :, None]), 1e-12)
    )
    boltz = jnp.where(below, boltz, 0.0)
    probs = jnp.einsum("tsk,s->tk", boltz, beta_m)  # [T, K]

    # thresholds with no trough below: mass to the global-min trough
    heights_masked = jnp.where(valid, heights, jnp.inf)
    gmin = jnp.argmin(heights_masked, axis=1)  # [T]
    no_trough_mass = jnp.einsum("ts,s->t", (n_below == 0).astype(beta_m.dtype), beta_m)
    probs = probs.at[jnp.arange(T), gmin].add(NO_TROUGH_PROB * no_trough_mass)
    probs = jnp.where(valid, probs, 0.0)

    voiced_prob = jnp.clip(jnp.sum(probs, axis=1), 0.0, 1.0)

    # ---- observations over pitch states ------------------------------------
    n_bins, freqs = _pitch_bins(fmin, fmax)
    bin_idx = jnp.clip(
        jnp.round(12.0 / RESOLUTION * jnp.log2(jnp.maximum(cand_freq, 1e-6) / fmin)),
        0,
        n_bins - 1,
    ).astype(jnp.int32)
    obs_voiced = jax.vmap(
        lambda bi, pr: jax.ops.segment_sum(pr, bi, n_bins)
    )(bin_idx, probs)  # [T, n_bins]
    obs_unvoiced = (1.0 - voiced_prob)[:, None] / n_bins
    obs = jnp.concatenate(
        [obs_voiced, jnp.broadcast_to(obs_unvoiced, (T, n_bins))], axis=1
    )
    log_obs = jnp.log(jnp.maximum(obs, 1e-30))

    # ---- Viterbi ------------------------------------------------------------
    log_A = jnp.asarray(_transition_log(n_bins, sr, hop))  # [2n, 2n]
    p_init = jnp.full((2 * n_bins,), NEG).at[n_bins:].set(-jnp.log(float(n_bins)))

    def fwd(delta, lo):
        cand = delta[:, None] + log_A  # [i, j]
        best_prev = jnp.argmax(cand, axis=0)
        delta = jnp.max(cand, axis=0) + lo
        return delta, best_prev

    delta0 = p_init + log_obs[0]
    delta_final, bps = lax.scan(fwd, delta0, log_obs[1:])  # bps: [T-1, 2n]
    last_state = jnp.argmax(delta_final)

    def back(state, bp_t):
        prev = bp_t[state]
        return prev, prev

    _, states_rev = lax.scan(back, last_state, bps, reverse=True)
    states = jnp.concatenate([states_rev, jnp.asarray([last_state])])  # [T]

    # Voicing: the Viterbi state AND the observation evidence must agree.
    # With librosa's exact parameters the no-trough mass concentrates on a
    # single pitch bin (~0.0099) while the unvoiced mass dilutes over all
    # bins (~0.0029 each), so on pure noise a Viterbi-only flag can drift
    # voiced inside the wide (+-70 bin) transition window even though
    # voiced_prob is ~0.01; gating on voiced_prob >= 0.5 keeps random-bin
    # f0 out of non-speech regions (deliberate divergence, documented).
    voiced_flag = (states < n_bins) & (voiced_prob >= 0.5)
    f0 = jnp.asarray(freqs)[states % n_bins]
    f0 = jnp.where(voiced_flag, f0, jnp.nan)
    if with_raw_yin:
        raw_f0, _ = select_f0(cmndf, band, tau_min, sr)
        return f0, voiced_flag, voiced_prob, raw_f0
    return f0, voiced_flag, voiced_prob
