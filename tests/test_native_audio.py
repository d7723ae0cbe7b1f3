"""Native C++ audio runtime: decode, resample, and parallel batch loading."""
import os

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


def test_corrupt_wavs_error_cleanly(tmp_path):
    """Corrupt headers must produce clean Python errors (or a clamped
    decode), never a crash through the C ABI."""
    import struct

    from multimodaltopicsegmentation_tpu.runtime import audio_native as nat

    if not nat.available():
        pytest.skip("native lib unavailable")

    zero_bits = tmp_path / "zero_bits.wav"
    zero_bits.write_bytes(
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 0)
        + b"data" + struct.pack("<I", 8) + b"\x00" * 8
    )
    with pytest.raises(RuntimeError):
        nat.read_wav(str(zero_bits))

    short_fmt = tmp_path / "short_fmt.wav"
    short_fmt.write_bytes(
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(RuntimeError):
        nat.read_wav(str(short_fmt))

    # declared data size far beyond the file: clamp to what exists
    huge = tmp_path / "huge.wav"
    huge.write_bytes(
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 8
    )
    audio, sr = nat.read_wav(str(huge))
    assert len(audio) == 4 and sr == 16000


def test_stereo_integer_wav_scaling(tmp_path):
    """Multi-channel 16-bit PCM must be scaled to [-1, 1] on BOTH decode
    paths (scipy's fallback previously averaged channels into float64 first
    and skipped the integer scaling)."""
    from scipy.io import wavfile

    from multimodaltopicsegmentation_tpu.utils.audio import _to_float_mono, load_audio

    sr = 16000
    t = np.arange(sr) / sr
    left = (0.5 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    right = (0.25 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    stereo = np.stack([left, right], axis=1)
    path = str(tmp_path / "stereo.wav")
    wavfile.write(path, sr, stereo)

    mono = _to_float_mono(stereo)
    assert np.max(np.abs(mono)) < 1.0
    np.testing.assert_allclose(
        mono, (left / 32768.0 + right / 32768.0) / 2, atol=1e-6
    )
    audio, _ = load_audio(path, target_sr=sr)
    assert np.max(np.abs(audio)) < 1.0


MP3_SAMPLE = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"


def _has_mp3_decoder():
    try:
        import pygame  # noqa: F401

        return os.path.exists(MP3_SAMPLE)
    except ImportError:
        return False


@pytest.mark.skipif(not _has_mp3_decoder(), reason="no pygame/sample mp3")
def test_load_audio_mp3():
    """mp3 decodes through the SDL_mixer delegation (the same third-party-
    decoder decision the reference's librosa->audioread path makes,
    extract_embeddings.py:207-224 pairs .mp3 transcripts)."""
    from multimodaltopicsegmentation_tpu.utils.audio import load_audio

    audio, sr = load_audio(MP3_SAMPLE, target_sr=16000)
    assert sr == 16000 and audio.dtype == np.float32 and audio.ndim == 1
    dur = len(audio) / sr
    assert 7.0 < dur < 7.5, dur  # known sample length ~7.26 s
    assert np.all(np.isfinite(audio))
    rms = float(np.sqrt(np.mean(audio**2)))
    assert 0.01 < rms < 1.0, rms  # real signal, correctly scaled to [-1, 1]


@pytest.mark.skipif(not _has_mp3_decoder(), reason="no pygame/sample mp3")
def test_extract_inference_on_mp3(tmp_path):
    """The inference extractor accepts .mp3 inputs end to end (the file
    discovery always matched them; decode now works too)."""
    import shutil
    from types import SimpleNamespace

    from multimodaltopicsegmentation_tpu.cli.extract_embeddings_inference import (
        main as eei_main,
    )

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    shutil.copy(MP3_SAMPLE, audio_dir / "doc0.mp3")
    out = str(tmp_path / "emb")
    eei_main(SimpleNamespace(
        vad=False, speechbrain=True, ecapa=False, openl3=False, wav2vec=False,
        CREPE=False, prosodic_feats=False, mfcc=True,
        audio_directory=str(audio_dir), out_directory=out,
        uniform_interval=1.0, adaptive_uniform_segmentation=False,
        verbose=False, continue_from_check=False,
    ))
    emb = np.load(os.path.join(out, "doc0.npy"))
    assert emb.shape == (7, 200)  # ~7.26 s of audio -> 7 one-second units
    assert np.all(np.isfinite(emb))
