"""CRDNN voice-activity-detection posterior network in JAX.

The reference's training-time unitization runs SpeechBrain's pretrained
neural VAD (/root/reference/extract_embeddings.py:116-121: ``VAD.from_hparams``
on a CRDNN checkpoint) to get per-frame speech posteriors on a 10 ms grid,
then post-processes them into speech spans (that pipeline lives in
``dsp/vad.py``). SpeechBrain is not installed here and pretrained weights
cannot be fetched (no egress), so this module provides the compute path the
framework owns:

- the SpeechBrain VAD front-end: 40-d log-mel fbanks (25 ms window / 10 ms
  hop, HTK mel scale, power->dB with an 80 dB floor) and sentence-level mean
  normalization — the ``compute_features`` / ``mean_var_norm`` stages of
  ``speechbrain.pretrained.VAD.get_speech_prob_chunk``;
- a faithful JAX CRDNN forward (conv2d blocks with layer norm, leaky ReLU
  and frequency max-pooling -> bidirectional LSTM -> dense blocks with batch
  norm -> sigmoid frame posterior), geometry read from the param tree so one
  forward serves whatever block/channel configuration the converted
  checkpoint carries;
- an npz reader for checkpoints produced by
  ``tools/convert_weights.py crdnn_vad`` (schema locked by
  tests/test_weight_converters.py against a torch replica of the
  SpeechBrain stack);
- random-weight smoke mode gated on MTS_RANDOM_ENCODER_WEIGHTS=1.

Everything is jittable; posteriors for a whole document are produced in one
device call instead of SpeechBrain's chunked host loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
N_MELS = 40
WIN, HOP = 400, 160  # 25 ms / 10 ms at 16 kHz (speechbrain Fbank defaults)
LEAKY_SLOPE = 0.01  # torch.nn.LeakyReLU default used by the CRDNN lobe


def htk_mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular filters on the HTK mel scale.

    speechbrain.processing.features.Filterbank builds triangular filters
    spaced on 2595*log10(1+f/700) without Slaney area normalization (unlike
    the librosa bank in dsp/spectral.py, which the rest of the DSP layer
    uses for librosa parity).
    """
    hz_to_mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)
    mel_to_hz = lambda m: 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0, np.minimum(lower, upper)).astype(np.float32)


def hamming_window(n: int) -> np.ndarray:
    """Periodic Hamming, matching torch.hamming_window(n) — speechbrain's
    STFT default (window_fn=torch.hamming_window)."""
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def vad_fbank(audio: jnp.ndarray, n_valid=None) -> jnp.ndarray:
    """[S] 16 kHz audio -> [T, 40] normalized log-mel features.

    Matches the VAD interface's feature path: centered ZERO-padded frames
    (speechbrain STFT center=True, pad_mode='constant' — NOT the reflect
    padding the librosa-parity DSP layer uses) windowed with the periodic
    HAMMING window (torch.hamming_window default) -> power spectrum -> 40
    HTK mel filters -> 10*log10 with amin 1e-10 and a per-utterance 80 dB
    floor (Filterbank._amplitude_to_DB) -> sentence-level mean subtraction
    (InputNormalization(norm_type='sentence', std_norm=False)). These are
    speechbrain's documented defaults; recheck against the checkpoint's
    hyperparams.yaml when converting real vad-crdnn weights.
    """
    from ..dsp.spectral import frame_signal

    audio = jnp.pad(audio, (WIN // 2, WIN // 2))  # constant (zero) centering
    frames = frame_signal(audio, WIN, HOP, center=False)
    win = jnp.asarray(hamming_window(WIN), audio.dtype)
    spec = jnp.abs(jnp.fft.rfft(frames * win, n=WIN, axis=-1)) ** 2
    bank = jnp.asarray(htk_mel_filterbank(SR, WIN, N_MELS))
    db = 10.0 * jnp.log10(jnp.maximum(spec @ bank.T, 1e-10))
    if n_valid is None:
        db = jnp.maximum(db, jnp.max(db) - 80.0)
        return db - jnp.mean(db, axis=0, keepdims=True)
    # length-aware variant for sample-bucketed audio: the per-utterance dB
    # floor and sentence mean come from the VALID frames only, and padded
    # frames are zeroed — bit-identical to running the unbucketed fbank and
    # zero-padding its frames (bucket zeros == the STFT's centering zeros)
    valid = (jnp.arange(db.shape[0]) < n_valid)[:, None]
    vmax = jnp.max(jnp.where(valid, db, -jnp.inf))
    db = jnp.maximum(db, vmax - 80.0)
    mean = jnp.sum(jnp.where(valid, db, 0.0), axis=0, keepdims=True) / jnp.maximum(
        n_valid, 1
    )
    return jnp.where(valid, db - mean, 0.0)


# ---------------------------------------------------------------------------
# CRDNN forward. Param tree (flat dict, the npz schema):
#   cnn{i}_w [kt, kf, cin, cout], cnn{i}_b [cout]
#   cnn{i}_ln_scale / cnn{i}_ln_bias  [f_i, cout]   (LayerNorm over freq+ch)
#   cnn{i}_pool []                                   (freq max-pool factor)
#   rnn_l{j}_fwd_w_ih [in, 4H], rnn_l{j}_fwd_w_hh [H, 4H], rnn_l{j}_fwd_b [4H]
#   rnn_l{j}_bwd_*                                   (same shapes)
#   dnn{j}_w [in, out], dnn{j}_b, dnn{j}_bn_{scale,bias,mean,var} [out]
#   out_w [in, 1], out_b [1]
# ---------------------------------------------------------------------------


def _conv2d_same(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, F, C] -> [B, T, F, C_out], stride-1 'SAME' zero padding
    (speechbrain Conv2d default padding='same')."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _freq_max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Max-pool the frequency axis of [B, T, F, C] by factor k (speechbrain
    Pooling1d(pool_type='max', pool_axis=2) inside each CNN block)."""
    if k <= 1:
        return x
    B, T, F, C = x.shape
    F2 = (F // k) * k
    return jnp.max(x[:, :, :F2].reshape(B, T, F2 // k, k, C), axis=3)


def num_cnn_blocks(params: dict) -> int:
    return sum(1 for k in params if k.startswith("cnn") and k.endswith("_w"))


def num_rnn_layers(params: dict) -> int:
    return sum(1 for k in params if k.startswith("rnn_l") and k.endswith("_fwd_w_ih"))


def num_dnn_blocks(params: dict) -> int:
    return sum(1 for k in params if k.startswith("dnn") and k.endswith("_w"))


def pool_factors(params: dict) -> tuple:
    """Per-block frequency pool factors as static Python ints (they select
    reshape shapes, so they must not be traced under jit)."""
    return tuple(
        int(params[f"cnn{i}_pool"]) for i in range(num_cnn_blocks(params))
    )


def apply(params: dict, feats: jnp.ndarray, lengths=None, pools: tuple = None) -> jnp.ndarray:
    """[B, T, 40] features -> [B, T] speech posteriors in [0, 1].

    Mirrors VAD.get_speech_prob_chunk's module chain: cnn -> flatten
    (freq, ch) -> rnn -> dnn, with the sigmoid the pretrained dnn ends in.
    `lengths` marks valid frames when the time axis is padded (the backward
    LSTM reverses within each true length); `pools` must be passed
    explicitly under jit (pool_factors(params) on the host).
    """
    from ..ops.rnn import bidirectional_rnn

    if pools is None:
        pools = pool_factors(params)
    B, T = feats.shape[:2]
    # Zero padded frames after every block: a block turns zero-padding into
    # nonzero values (conv bias, LayerNorm of zeros), which the next conv's
    # time halo — and from there the backward LSTM — would smear into the
    # valid region. Re-zeroing makes padded inference bit-match the unpadded
    # 'SAME' convolution.
    tmask = None
    if lengths is not None:
        tmask = (jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]).astype(
            feats.dtype
        )[..., None, None]
    x = feats[..., None]  # [B, T, F, 1]
    for i in range(num_cnn_blocks(params)):
        if tmask is not None:
            x = x * tmask
        x = _conv2d_same(x, params[f"cnn{i}_w"], params[f"cnn{i}_b"])
        # LayerNorm over the trailing (freq, channel) dims, torch semantics
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * params[f"cnn{i}_ln_scale"] + params[f"cnn{i}_ln_bias"]
        x = jnp.where(x >= 0, x, LEAKY_SLOPE * x)
        x = _freq_max_pool(x, pools[i])

    B, T, F, C = x.shape
    x = x.reshape(B, T, F * C)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    for j in range(num_rnn_layers(params)):
        x = bidirectional_rnn(
            {k[len(f"rnn_l{j}_fwd_") :]: v for k, v in params.items()
             if k.startswith(f"rnn_l{j}_fwd_")},
            {k[len(f"rnn_l{j}_bwd_") :]: v for k, v in params.items()
             if k.startswith(f"rnn_l{j}_bwd_")},
            x, lengths, cell="lstm",
        )

    for j in range(num_dnn_blocks(params)):
        x = x @ params[f"dnn{j}_w"] + params[f"dnn{j}_b"]
        # BatchNorm1d in eval mode: running stats folded per feature
        inv = jax.lax.rsqrt(params[f"dnn{j}_bn_var"] + 1e-5)
        x = (x - params[f"dnn{j}_bn_mean"]) * inv * params[f"dnn{j}_bn_scale"]
        x = x + params[f"dnn{j}_bn_bias"]
        x = jnp.where(x >= 0, x, LEAKY_SLOPE * x)

    logits = x @ params["out_w"] + params["out_b"]
    return jax.nn.sigmoid(logits[..., 0])


_APPLY_JIT = {}


def posteriors(params: dict, audio: np.ndarray, sr: int) -> np.ndarray:
    """Whole-document speech posteriors on the 10 ms grid, one device call.

    The AUDIO is padded to a 30 s sample bucket (3000 frames x HOP) before
    the fbank, so the whole fbank+CRDNN program compiles once per bucket
    rather than once per document length (compiles are expensive on the
    remote axon backend); the fbank normalizes over valid frames only and
    the backward LSTM still starts from the true final frame.
    """
    audio = np.asarray(audio)
    if audio.size == 0:
        # match the energy-logistic path's graceful empty-input behavior
        return np.zeros((0,), np.float32)
    if sr != SR:
        from ..utils.audio import resample

        audio = resample(audio, sr, SR)
    t = audio.size // HOP + 1  # frames the unbucketed fbank would produce
    sample_bucket = 3000 * HOP
    padded = sample_bucket * max((audio.size + sample_bucket - 1) // sample_bucket, 1)
    audio = np.pad(audio, (0, padded - audio.size))

    pools = pool_factors(params)
    key = (pools, padded)
    if key not in _APPLY_JIT:
        _APPLY_JIT[key] = jax.jit(
            lambda p, a, l: apply(
                p, vad_fbank(a, n_valid=l[0])[None], lengths=l, pools=pools
            )
        )
    arrays = {k: v for k, v in params.items() if not k.endswith("_pool")}
    out = _APPLY_JIT[key](
        arrays, jnp.asarray(audio, jnp.float32), jnp.asarray([t], jnp.int32)
    )
    return np.asarray(out)[0, :t]


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def load_npz(path: str) -> dict:
    """Read a checkpoint written by tools/convert_weights.py crdnn_vad."""
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def random_params(
    rng,
    cnn_channels=(16, 32),
    cnn_kernel=(3, 3),
    pool=2,
    rnn_layers=2,
    rnn_neurons=32,
    dnn_blocks=1,
    dnn_neurons=16,
    n_mels: int = N_MELS,
) -> dict:
    """Random CRDNN of the published vad-crdnn-libriparty geometry — the
    MTS_RANDOM_ENCODER_WEIGHTS=1 smoke mode and the fixture generator for
    the converter tests."""
    from ..ops.rnn import lstm_params

    params = {}
    cin, f = 1, n_mels
    for i, cout in enumerate(cnn_channels):
        rng, k = jax.random.split(rng)
        params[f"cnn{i}_w"] = 0.1 * jax.random.normal(
            k, (cnn_kernel[0], cnn_kernel[1], cin, cout), jnp.float32
        )
        params[f"cnn{i}_b"] = jnp.zeros((cout,))
        params[f"cnn{i}_ln_scale"] = jnp.ones((f, cout))
        params[f"cnn{i}_ln_bias"] = jnp.zeros((f, cout))
        params[f"cnn{i}_pool"] = jnp.asarray(pool, jnp.int32)
        cin, f = cout, f // pool

    in_dim = f * cin
    for j in range(rnn_layers):
        for d in ("fwd", "bwd"):
            rng, k = jax.random.split(rng)
            p = lstm_params(k, in_dim, rnn_neurons)
            for name, v in p.items():
                params[f"rnn_l{j}_{d}_{name}"] = v
        in_dim = 2 * rnn_neurons

    for j in range(dnn_blocks):
        rng, k = jax.random.split(rng)
        params[f"dnn{j}_w"] = 0.1 * jax.random.normal(k, (in_dim, dnn_neurons))
        params[f"dnn{j}_b"] = jnp.zeros((dnn_neurons,))
        params[f"dnn{j}_bn_scale"] = jnp.ones((dnn_neurons,))
        params[f"dnn{j}_bn_bias"] = jnp.zeros((dnn_neurons,))
        params[f"dnn{j}_bn_mean"] = jnp.zeros((dnn_neurons,))
        params[f"dnn{j}_bn_var"] = jnp.ones((dnn_neurons,))
        in_dim = dnn_neurons

    rng, k = jax.random.split(rng)
    params["out_w"] = 0.1 * jax.random.normal(k, (in_dim, 1))
    params["out_b"] = jnp.zeros((1,))
    return params
