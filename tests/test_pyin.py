"""pyin HMM pitch tracker tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.dsp.pyin import pyin


SR = 16000


def test_pyin_tracks_sine():
    t = np.arange(SR) / SR
    for hz in (110.0, 220.0, 330.0):
        y = np.sin(2 * np.pi * hz * t).astype(np.float32)
        f0, voiced, vprob = pyin(jnp.asarray(y), SR)
        f0 = np.asarray(f0)
        assert np.asarray(voiced)[2:-2].all()
        assert np.nanmedian(f0) == pytest.approx(hz, rel=0.01), hz
        assert np.median(np.asarray(vprob)) > 0.9


def test_pyin_noise_unvoiced():
    y = (0.1 * np.random.default_rng(0).standard_normal(SR)).astype(np.float32)
    f0, voiced, vprob = pyin(jnp.asarray(y), SR)
    assert np.median(np.asarray(vprob)) < 0.5
    assert np.asarray(voiced).mean() < 0.5
    assert np.isnan(np.asarray(f0)[~np.asarray(voiced)]).all()


def test_pyin_glide_is_smooth():
    """A pitch glide: Viterbi should produce a monotone-ish smooth track
    without octave jumps."""
    t = np.arange(2 * SR) / SR
    hz = 150.0 * 2 ** (t / 2.0)  # one octave over 2 s
    phase = 2 * np.pi * np.cumsum(hz) / SR
    y = np.sin(phase).astype(np.float32)
    f0, voiced, _ = pyin(jnp.asarray(y), SR)
    f0 = np.asarray(f0)[np.asarray(voiced)]
    # no octave-scale discontinuities between adjacent voiced frames
    ratios = f0[1:] / f0[:-1]
    assert np.all((ratios > 0.8) & (ratios < 1.25))
    # overall rising
    assert f0[-1] > f0[0] * 1.7


def test_pyin_voicing_transitions():
    """tone | silence | tone: voicing must switch off in the gap."""
    t = np.arange(SR // 2) / SR
    tone = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    gap = np.zeros(SR // 2, np.float32)
    y = np.concatenate([tone, gap, tone])
    f0, voiced, vprob = pyin(jnp.asarray(y), SR)
    v = np.asarray(voiced)
    n = len(v)
    third = n // 3
    assert v[2 : third - 2].mean() > 0.8
    assert v[third + 2 : 2 * third - 2].mean() < 0.3
    assert v[2 * third + 2 : n - 2].mean() > 0.8
