"""Native C++ audio runtime: decode, resample, and parallel batch loading."""
import numpy as np
import pytest
from scipy.io import wavfile

from multimodaltopicsegmentation_tpu.runtime import audio_native


@pytest.fixture(scope="module")
def lib_ok():
    if not audio_native.available():
        pytest.skip("native audio library not built and no compiler available")


def _tone(sr, secs=1.0, hz=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_decode_formats(lib_ok, tmp_path):
    sr = 22050
    sig = _tone(sr)
    wavfile.write(tmp_path / "i16.wav", sr, (sig * 32767).astype(np.int16))
    wavfile.write(tmp_path / "f32.wav", sr, sig)
    wavfile.write(tmp_path / "st.wav", sr, np.stack([sig, -sig], 1))

    a, r = audio_native.read_wav(str(tmp_path / "i16.wav"))
    assert r == sr and np.abs(a - sig).max() < 1e-4
    a, r = audio_native.read_wav(str(tmp_path / "f32.wav"))
    assert np.abs(a - sig).max() == 0.0
    a, r = audio_native.read_wav(str(tmp_path / "st.wav"))
    assert np.abs(a).max() == 0.0  # mono mixdown of (x, -x)


def test_resample_matches_scipy(lib_ok, tmp_path):
    from scipy.signal import resample_poly

    sr = 22050
    sig = _tone(sr, secs=2.0)
    wavfile.write(tmp_path / "a.wav", sr, sig)
    a, r = audio_native.read_wav(str(tmp_path / "a.wav"), target_sr=16000)
    assert r == 16000
    ref = resample_poly(sig, 320, 441)
    n = min(len(a), len(ref))
    assert np.abs(a[1000 : n - 1000] - ref[1000 : n - 1000]).max() < 5e-3


def test_batch_loader(lib_ok, tmp_path):
    sr = 16000
    paths = []
    for i in range(6):
        sig = _tone(sr, secs=0.5, hz=200.0 + 50 * i)
        p = str(tmp_path / f"d{i}.wav")
        wavfile.write(p, sr, sig)
        paths.append(p)
    paths.append(str(tmp_path / "missing.wav"))

    results = audio_native.read_wav_batch(paths, target_sr=16000)
    assert len(results) == 7
    for i in range(6):
        a, r = results[i]
        assert r == 16000 and len(a) == sr // 2
        solo, _ = audio_native.read_wav(paths[i], target_sr=16000)
        np.testing.assert_array_equal(a, solo)
    assert results[6] == (None, 0)
