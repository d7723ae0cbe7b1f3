"""DSP front-end tests vs scipy/numpy references and the reference's own
pause-run algorithm."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.dsp import spectral as S
from multimodaltopicsegmentation_tpu.dsp.prosody import (
    mfcc_features,
    pause_statistics,
    prosodic_features,
)
from multimodaltopicsegmentation_tpu.dsp.yin import yin
from multimodaltopicsegmentation_tpu.ops import pooling as P


def test_hann_matches_scipy():
    from scipy.signal import get_window

    np.testing.assert_allclose(
        S.hann_window(512), get_window("hann", 512, fftbins=True), atol=1e-12
    )


def test_stft_power_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(4096).astype(np.float32)
    out = np.asarray(S.stft_power(jnp.asarray(y), n_fft=1024, hop=256))
    # manual: center pad reflect, frame, window, rfft
    pad = np.pad(y, (512, 512), mode="reflect")
    win = S.hann_window(1024)
    n_frames = 1 + (len(pad) - 1024) // 256
    ref = np.zeros((513, n_frames))
    for t in range(n_frames):
        fr = pad[t * 256 : t * 256 + 1024] * win
        ref[:, t] = np.abs(np.fft.rfft(fr)) ** 2
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dct_matches_scipy():
    from scipy.fft import dct

    x = np.random.default_rng(1).standard_normal((16, 5)).astype(np.float32)
    ours = S.dct_ii_ortho_matrix(16) @ x
    ref = dct(x, type=2, axis=0, norm="ortho")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mel_filterbank_properties():
    bank = S.mel_filterbank(16000, 1024, 40)
    assert bank.shape == (40, 513)
    assert np.all(bank >= 0)
    # every filter has some support and peaks move upward in frequency
    peaks = bank.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0) and peaks[0] < peaks[-1]
    # slaney normalization: filters are ~2/bandwidth scaled, not unit-sum
    assert 0 < bank.sum() < 40


def test_delta_matches_savgol_interior():
    from scipy.signal import savgol_filter

    x = np.random.default_rng(2).standard_normal((3, 50)).astype(np.float32)
    ours = np.asarray(S.delta(jnp.asarray(x), width=9))
    ref = savgol_filter(x, 9, polyorder=1, deriv=1, axis=-1, mode="interp")
    # interior must match exactly; edges use different extrapolation
    np.testing.assert_allclose(ours[:, 4:-4], ref[:, 4:-4], atol=1e-4)


def test_yin_detects_sine_pitch():
    sr = 16000
    t = np.arange(sr) / sr
    for hz in (110.0, 220.0, 330.0):
        y = np.sin(2 * np.pi * hz * t).astype(np.float32)
        f0, voicing = yin(jnp.asarray(y), sr)
        f0 = np.asarray(f0)
        v = np.asarray(voicing)
        assert np.nanmedian(f0) == pytest.approx(hz, rel=0.02), hz
        assert np.median(v) > 0.9


def test_yin_noise_is_unvoiced():
    sr = 16000
    y = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.1
    f0, voicing = yin(jnp.asarray(y), sr)
    assert np.median(np.asarray(voicing)) < 0.5


def _pause_reference(vi, delta=0.5):
    """Direct transcription of get_pause_durations (extract_acoustic_features.py:20-55)."""
    pauses, voiced = [], []
    pause, add = 0, False
    for sample in vi:
        if sample < delta:
            pause += 1
            add = True
        else:
            if add:
                pauses.append(pause)
                pause = 0
                add = False
            voiced.append(sample)
    if not pauses:
        if pause > 0:
            pauses.append(pause)
            voiced.append(0)
        else:
            pauses.append(0)
            voiced = list(vi)
    return np.array(pauses, float), np.array(voiced, float)


@pytest.mark.parametrize("seed", range(6))
def test_pause_statistics_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = 40
    vi = rng.random(n).astype(np.float32)
    if seed == 3:
        vi = np.clip(vi, 0.6, 1.0)  # no pauses at all
    if seed == 4:
        vi = np.clip(vi, 0.0, 0.4)  # one giant open trailing pause
    if seed == 5:
        vi[-10:] = 0.1  # trailing open run after completed runs
    ref_p, ref_v = _pause_reference(vi)
    pm, ps, vm, vs = pause_statistics(jnp.asarray(vi), jnp.ones(n))
    assert float(pm) == pytest.approx(np.nanmean(ref_p), abs=1e-5)
    assert float(ps) == pytest.approx(np.nanstd(ref_p), abs=1e-5)
    assert float(vm) == pytest.approx(np.nanmean(ref_v), abs=1e-5)
    assert float(vs) == pytest.approx(np.nanstd(ref_v), abs=1e-5)


def test_feature_vector_dims():
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    u1 = np.sin(2 * np.pi * 200 * t) + 0.05 * rng.standard_normal(sr)
    u2 = 0.1 * rng.standard_normal(sr)
    units = jnp.asarray(np.stack([u1, u2]).astype(np.float32))
    lengths = jnp.asarray(np.array([sr, sr // 2]))
    pros = prosodic_features(units, lengths, sr)
    assert pros.shape == (2, 167)
    assert np.all(np.isfinite(np.asarray(pros)))
    mf = mfcc_features(units, lengths, sr)
    assert mf.shape == (2, 200)
    assert np.all(np.isfinite(np.asarray(mf)))


def test_pooling_variants_match_loops():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((20, 6)).astype(np.float32)
    seg = np.repeat(np.arange(4), [3, 7, 4, 6])
    units = [frames[seg == i] for i in range(4)]

    f, s = jnp.asarray(frames), jnp.asarray(seg)
    np.testing.assert_allclose(
        np.asarray(P.pool(f, s, 4, "_mean")), np.stack([u.mean(0) for u in units]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(P.pool(f, s, 4, "_max")), np.stack([u.max(0) for u in units]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(P.pool(f, s, 4, "_mean_std")),
        np.stack([np.concatenate([u.mean(0), u.std(0)]) for u in units]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(P.pool(f, s, 4, "_last")), np.stack([u[-1] for u in units]), atol=1e-6
    )
    # reference delta_gap: next unit first frame - this unit's last; final=last
    ref_dg = []
    for i, u in enumerate(units):
        if i + 1 < len(units):
            ref_dg.append(units[i + 1][0] - u[-1])
        else:
            ref_dg.append(u[-1])
    np.testing.assert_allclose(
        np.asarray(P.pool(f, s, 4, "_delta_gap")), np.stack(ref_dg), atol=1e-6
    )


def test_pitch_jump_survives_unvoiced_frames_in_previous_unit():
    """The chained previous-unit track is PLAIN yin (defined at every
    frame, like librosa.yin in the reference) — a voicing-masked track
    would NaN the tail statistics whenever the previous unit contains ANY
    unvoiced frame (real speech always does) and silently zero the
    pitch-jump feature, dim 167 of the prosodic vector."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    prev = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    gap = slice(sr // 2, sr // 2 + sr // 8)  # 0.125 s noise gap -> unvoiced
    prev[gap] = 0.05 * rng.standard_normal(sr // 8).astype(np.float32)
    cur = np.sin(2 * np.pi * 330 * t).astype(np.float32)
    units = jnp.asarray(np.stack([prev, cur]))
    lengths = jnp.asarray(np.array([sr, sr]))
    for use_pyin in (True, False):
        pros = np.asarray(
            prosodic_features(units, lengths, sr, use_pyin=use_pyin)
        )
        assert np.all(np.isfinite(pros))
        jump = pros[1, 166]
        assert jump != 0.0, f"use_pyin={use_pyin}: pitch jump collapsed to 0"
        # rough magnitude sanity: both tracks are tone-dominated, so the
        # normalized head/tail ratio difference stays small but clearly
        # nonzero
        assert 1e-4 < abs(jump) < 2.0, (use_pyin, jump)


def test_pooling_empty_segments_yield_zero_rows():
    """Units with zero frames must pool to zero rows (not the dtype-min
    sentinel segment_max produces, nor an arbitrary clamped gather row) —
    the hazard is latent today (the extract CLI guarantees non-empty
    units) but a padded unit axis would silently corrupt embeddings."""
    from multimodaltopicsegmentation_tpu.ops.pooling import pool

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((5, 3)).astype(np.float32))
    seg_ids = jnp.asarray(np.array([0, 0, 1, 1, 1]))  # units 2,3 empty
    for variant in ("_mean", "_max", "_mean_std", "_max_std", "_last"):
        out = np.asarray(pool(frames, seg_ids, 4, variant))
        assert np.all(np.isfinite(out)), variant
        assert np.all(out[2:] == 0.0), (variant, out[2:])
