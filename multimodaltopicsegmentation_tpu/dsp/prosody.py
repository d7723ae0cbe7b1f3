"""Prosodic (167-d) and MFCC (200-d) unit feature vectors, batched + jitted.

Replicates /root/reference/extract_acoustic_features.py semantics:

- prosodic vector = [nanmean, nanstd] of {pYIN f0, pause durations, voiced
  segment intensities} (2 each) + per-mel-band [nanmean, nanstd] of the
  40-mel power spectrogram and its delta (80 + 80) + 1 pitch-jump scalar
  vs the previous unit = 167 dims (get_acoustic_features :58-108)
- mfcc vector = [nanmean, nanstd] of 50 MFCCs and their deltas = 200 dims
- pauses are maximal runs of voicing intensity < 0.5 that END before the
  unit does; the trailing open run only counts when no pause completed,
  and the no-pause-at-all case scores voiced statistics over every frame
  (get_pause_durations :20-55, all three quirk branches replicated)

The reference loops units serially through librosa on host; here a whole
document's units are one [n_units, max_samples] batch — framing, mel,
MFCC, YIN and all statistics are batched device ops, with frame masks
handling ragged unit lengths. Run-length pause statistics use a lax.scan
carrying (count, sum, sumsq) so no dynamic shapes appear.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import delta, melspectrogram, mfcc as mfcc_fn
from .yin import yin

HOP = 512
FRAME = 2048


def _n_frames(n_samples: jnp.ndarray) -> jnp.ndarray:
    """librosa centered frame count: 1 + floor(n / hop)."""
    return 1 + n_samples // HOP


def _masked_mean_std(x: jnp.ndarray, mask: jnp.ndarray, axis=-1):
    """mean/std (ddof=0) over masked entries; zeros when empty."""
    cnt = jnp.sum(mask, axis=axis)
    s = jnp.sum(x * mask, axis=axis)
    mean = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0)
    var = jnp.where(
        cnt > 0,
        jnp.sum(mask * (x - jnp.expand_dims(mean, axis)) ** 2, axis=axis)
        / jnp.maximum(cnt, 1),
        0.0,
    )
    return mean, jnp.sqrt(var)


def pause_statistics(voicing: jnp.ndarray, frame_mask: jnp.ndarray):
    """Per the reference's get_pause_durations, on one [T] voicing track.

    Returns (pause_mean, pause_std, voiced_mean, voiced_std).
    """
    is_pause = (voicing < 0.5) & (frame_mask > 0)
    is_voiced = (voicing >= 0.5) & (frame_mask > 0)

    def step(carry, xs):
        run, cnt, s, ss = carry
        pause_t, valid_t = xs
        # a voiced valid frame closes any open run
        close = valid_t & jnp.logical_not(pause_t) & (run > 0)
        cnt = cnt + jnp.where(close, 1, 0)
        s = s + jnp.where(close, run, 0)
        ss = ss + jnp.where(close, run * run, 0)
        run = jnp.where(pause_t & valid_t, run + 1, jnp.where(valid_t, 0, run))
        return (run, cnt, s, ss), None

    (open_run, cnt, s, ss), _ = jax.lax.scan(
        step,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        (is_pause, frame_mask > 0),
    )

    v_mean, v_std = _masked_mean_std(voicing, is_voiced.astype(voicing.dtype))
    n_voiced = jnp.sum(is_voiced)

    # completed pauses exist: stats over them, voiced stats over voiced frames
    p_mean0 = s / jnp.maximum(cnt, 1)
    p_var0 = ss / jnp.maximum(cnt, 1) - p_mean0**2
    # no completed pause but trailing open run: pauses=[run], voiced gets a 0
    vs_cnt = n_voiced + 1
    v_mean1 = jnp.sum(voicing * is_voiced) / jnp.maximum(vs_cnt, 1)
    v_var1 = (
        jnp.sum(is_voiced * (voicing - v_mean1) ** 2) + (0.0 - v_mean1) ** 2
    ) / jnp.maximum(vs_cnt, 1)
    # no pause at all: pauses=[0], voiced stats over ALL valid frames
    a_mean, a_std = _masked_mean_std(voicing, frame_mask)

    has_completed = cnt > 0
    has_open = open_run > 0

    pause_mean = jnp.where(
        has_completed, p_mean0, jnp.where(has_open, open_run.astype(voicing.dtype), 0.0)
    )
    pause_std = jnp.where(has_completed, jnp.sqrt(jnp.maximum(p_var0, 0.0)), 0.0)
    voiced_mean = jnp.where(
        has_completed, v_mean, jnp.where(has_open, v_mean1, a_mean)
    )
    voiced_std = jnp.where(
        has_completed, v_std, jnp.where(has_open, jnp.sqrt(jnp.maximum(v_var1, 0.0)), a_std)
    )
    return pause_mean, pause_std, voiced_mean, voiced_std


def _f0_stats(f0: jnp.ndarray, frame_mask: jnp.ndarray):
    """nanmean/nanstd with the reference's all-NaN -> zeros fallback."""
    valid = jnp.isfinite(f0) & (frame_mask > 0)
    f0z = jnp.where(valid, f0, 0.0)
    mean, std = _masked_mean_std(f0z, valid.astype(f0.dtype))
    return mean, std, valid


@partial(jax.jit, static_argnames=("sr", "use_pyin"))
def prosodic_features(
    units: jnp.ndarray,  # [U, S] zero-padded unit audio
    unit_lengths: jnp.ndarray,  # [U] sample counts
    sr: int,
    use_pyin: bool = True,
) -> jnp.ndarray:
    """[U, 167] prosodic vectors; pitch jumps chain previous units in order.

    use_pyin=True runs the full HMM pitch tracker (reference parity:
    extract_acoustic_features.py:75 uses librosa.pyin); False falls back to
    plain YIN (faster, near-identical statistics on clean speech)."""
    U, S = units.shape
    T = int(1 + S // HOP)

    def per_unit(y, n):
        t_valid = _n_frames(n)
        fmask = (jnp.arange(T) < t_valid).astype(y.dtype)
        # the reference chains PLAIN yin (no voicing mask, never NaN) as the
        # previous-unit track for the pitch jump (extract_embeddings.py:523,
        # 529 chain librosa.yin, which is defined at EVERY frame). A
        # voicing-masked raw track would NaN the tail sums below and
        # silently zero the jump on any real unit with an unvoiced frame.
        if use_pyin:
            from .pyin import pyin as pyin_fn

            # raw plain-yin track from the same CMNDF — no second FFT pass
            f0, _vflag, voicing, raw_f0 = pyin_fn(y, sr, with_raw_yin=True)
        else:
            raw_f0, voicing = yin(y, sr, mask_unvoiced=False)
            f0 = jnp.where(voicing >= 0.5, raw_f0, jnp.nan)
        f0, voicing, raw_f0 = f0[:T], voicing[:T], raw_f0[:T]
        f0_mean, f0_std, f0_valid = _f0_stats(f0, fmask)
        p_mean, p_std, v_mean, v_std = pause_statistics(voicing, fmask)
        mel = melspectrogram(y, sr, n_mels=40)[:, :T]
        dmel = delta(mel)
        mel_mean, mel_std = _masked_mean_std(mel, fmask[None, :])
        dmel_mean, dmel_std = _masked_mean_std(dmel, fmask[None, :])
        stats = jnp.concatenate(
            [
                jnp.stack([f0_mean, f0_std, p_mean, p_std, v_mean, v_std]),
                mel_mean,
                mel_std,
                dmel_mean,
                dmel_std,
            ]
        )
        return stats, (f0, raw_f0, f0_valid, t_valid)

    stats, (f0_all, raw_all, f0_valid_all, tvalid_all) = jax.vmap(per_unit)(
        units, unit_lengths
    )

    # Pitch jump vs the previous unit (first unit -> 0). Reference math
    # (extract_acoustic_features.py:97-106): nanmean over the first len//5
    # pyin frames of f0/nanmean(f0), MINUS the mean over the previous unit's
    # last len//5 PLAIN-yin frames of prev/mean(prev). Degenerate cases all
    # collapse to 0 like the reference: an empty head slice (unit under 5
    # frames), an all-unvoiced current unit (reference zero-fills f0, the
    # ratio goes 0/0 -> NaN -> 0). A previous unit under 5 frames uses its
    # WHOLE track (the reference's prev[-0:] slice quirk).
    def jump(i):
        f0 = f0_all[i]
        vmask = f0_valid_all[i]
        t = tvalid_all[i]
        head = (jnp.arange(T) < t // 5) & vmask
        head_cnt = jnp.sum(head)
        voiced = jnp.sum(vmask)
        overall = jnp.sum(jnp.where(vmask, f0, 0.0)) / jnp.maximum(voiced, 1)
        head_mean = (
            jnp.sum(jnp.where(head, f0, 0.0))
            / jnp.maximum(head_cnt, 1)
            / jnp.maximum(overall, 1e-8)
        )

        praw = raw_all[i - 1]
        pt = tvalid_all[i - 1]
        pt5 = pt // 5
        n_tail = jnp.where(pt5 > 0, pt5, pt)
        idx = jnp.arange(T)
        tail = (idx >= pt - n_tail) & (idx < pt)
        poverall = jnp.sum(jnp.where(idx < pt, praw, 0.0)) / jnp.maximum(pt, 1)
        tail_mean = (
            jnp.sum(jnp.where(tail, praw, 0.0))
            / jnp.maximum(n_tail, 1)
            / jnp.maximum(poverall, 1e-8)
        )

        j = head_mean - tail_mean
        ok = (head_cnt > 0) & (voiced > 0) & (pt > 0) & jnp.isfinite(j)
        return jnp.where((i == 0) | ~ok, 0.0, j)

    jumps = jax.vmap(jump)(jnp.arange(U))
    return jnp.concatenate([stats, jumps[:, None]], axis=-1)


@partial(jax.jit, static_argnames=("sr",))
def mfcc_features(units: jnp.ndarray, unit_lengths: jnp.ndarray, sr: int) -> jnp.ndarray:
    """[U, 200] = nanmean+nanstd of 50 MFCCs and their deltas."""
    U, S = units.shape
    T = int(1 + S // HOP)

    def per_unit(y, n):
        fmask = (jnp.arange(T) < _n_frames(n)).astype(y.dtype)
        m = mfcc_fn(y, sr, n_mfcc=50)[:, :T]
        dm = delta(m)
        m_mean, m_std = _masked_mean_std(m, fmask[None, :])
        dm_mean, dm_std = _masked_mean_std(dm, fmask[None, :])
        # reference order: mean(x), mean(delta), std(x), std(delta)
        return jnp.concatenate([m_mean, dm_mean, m_std, dm_std])

    return jax.vmap(per_unit)(units, unit_lengths)
