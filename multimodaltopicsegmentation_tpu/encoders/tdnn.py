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
from .engine_util import bucket_rows, pad_units

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
    """x: [T, C_in], w: [K, C_in, C_out] 'same' REFLECT padding.

    speechbrain's Conv1d wrapper (used by every TDNNBlock in Xvector and
    ECAPA_TDNN) defaults to padding='same', padding_mode='reflect' — zero
    padding here would make converted pretrained weights see different
    boundary frames than they were trained with.
    """
    K = w.shape[0]
    pad = (K - 1) * dilation // 2
    if pad > 0:
        x = jnp.pad(x, ((pad, pad), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="VALID",
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


def _tdnn_block_init(rng, k, cin, cout):
    """speechbrain TDNNBlock = Conv1d -> ReLU -> BatchNorm1d."""
    return {
        "w": jax.random.normal(rng, (k, cin, cout)) * (1.0 / np.sqrt(k * cin)),
        "b": jnp.zeros((cout,)),
        "bn": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
               "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))},
    }


def _tdnn_block_apply(p, x, dilation=1):
    return _bn(p["bn"], jax.nn.relu(_conv1d_ncl(x, p["w"], p["b"], dilation=dilation)))


def ecapa_init(rng, n_mels: int = 80, channels: int = 512, emb_dim: int = 192,
               scale: int = 8, se_channels: int = 128, attn_channels: int = 128) -> dict:
    """Mirrors speechbrain.lobes.models.ECAPA_TDNN.ECAPA_TDNN exactly
    (channels [512]*4+[1536... here mfa=3*channels->1536-analogue], kernels
    [5,3,3,3], dilations [1,2,3,4], res2net scale 8, global-context ASP) so
    spkrec-ecapa-voxceleb weights map 1:1 via ecapa_load_npz."""
    def conv(rng, k, cin, cout):
        return {
            "w": jax.random.normal(rng, (k, cin, cout)) * (1.0 / np.sqrt(k * cin)),
            "b": jnp.zeros((cout,)),
        }

    keys = iter(jax.random.split(rng, 128))
    mfa_out = 3 * channels  # speechbrain uses channels[-1] = 1536 for C=512
    p = {"stem": _tdnn_block_init(next(keys), 5, n_mels, channels), "blocks": []}
    width = channels // scale
    for _dil in ECAPA_DILATIONS:
        block = {
            "tdnn1": _tdnn_block_init(next(keys), 1, channels, channels),
            "res2net": [_tdnn_block_init(next(keys), 3, width, width)
                        for _ in range(scale - 1)],
            "tdnn2": _tdnn_block_init(next(keys), 1, channels, channels),
            "se1": conv(next(keys), 1, channels, se_channels),
            "se2": conv(next(keys), 1, se_channels, channels),
        }
        p["blocks"].append(block)
    p["mfa"] = _tdnn_block_init(next(keys), 1, channels * 3, mfa_out)
    p["asp_tdnn"] = _tdnn_block_init(next(keys), 1, mfa_out * 3, attn_channels)
    p["asp_conv"] = conv(next(keys), 1, attn_channels, mfa_out)
    p["asp_bn"] = {"scale": jnp.ones((2 * mfa_out,)), "bias": jnp.zeros((2 * mfa_out,)),
                   "mean": jnp.zeros((2 * mfa_out,)), "var": jnp.ones((2 * mfa_out,))}
    p["fc_w"] = jax.random.normal(next(keys), (2 * mfa_out, emb_dim)) * 0.01
    p["fc_b"] = jnp.zeros((emb_dim,))
    return p


def ecapa_apply(params: dict, feats: jnp.ndarray, frame_mask: jnp.ndarray,
                scale: int = 8) -> jnp.ndarray:
    m = frame_mask[:, None]
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    x = _tdnn_block_apply(params["stem"], feats)

    outs = []
    for bi, block in enumerate(params["blocks"]):
        dilation = ECAPA_DILATIONS[bi]
        res = x
        # SERes2NetBlock: tdnn1 -> res2net -> tdnn2 -> SE -> + residual
        h = _tdnn_block_apply(block["tdnn1"], x)
        chunks = jnp.split(h, scale, axis=-1)
        ys = [chunks[0]]
        prev = None
        for i, sub in enumerate(block["res2net"]):
            inp = chunks[i + 1] if prev is None else chunks[i + 1] + prev
            prev = _tdnn_block_apply(sub, inp, dilation=dilation)
            ys.append(prev)
        h = jnp.concatenate(ys, axis=-1)
        h = _tdnn_block_apply(block["tdnn2"], h)
        # squeeze-excitation over the masked time mean
        s = jnp.sum(h * m, axis=0) / cnt
        s = jax.nn.relu(s @ block["se1"]["w"][0] + block["se1"]["b"])
        s = jax.nn.sigmoid(s @ block["se2"]["w"][0] + block["se2"]["b"])
        x = res + h * s[None, :]
        outs.append(x)

    cat = jnp.concatenate(outs, axis=-1)
    h = _tdnn_block_apply(params["mfa"], cat)

    # attentive statistics pooling with global context
    mu = jnp.sum(h * m, axis=0) / cnt
    sg = jnp.sqrt(jnp.maximum(jnp.sum(m * (h - mu) ** 2, axis=0) / cnt, 1e-10))
    T = h.shape[0]
    ctx = jnp.concatenate([h, jnp.tile(mu, (T, 1)), jnp.tile(sg, (T, 1))], axis=-1)
    a = jnp.tanh(_tdnn_block_apply(params["asp_tdnn"], ctx))
    a = _conv1d_ncl(a, params["asp_conv"]["w"], params["asp_conv"]["b"])
    a = jnp.where(m > 0, a, -1e9)
    a = jax.nn.softmax(a, axis=0)
    mean = jnp.sum(a * h, axis=0)
    var = jnp.sum(a * (h - mean) ** 2, axis=0)
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-10))])
    stats = _bn(params["asp_bn"], stats[None, :])[0]
    return stats @ params["fc_w"] + params["fc_b"]


# ---------------------------------------------------------------------------
# npz weight import (schemas written by tools/convert_weights.py)
# ---------------------------------------------------------------------------


def _bn_from(d, prefix):
    bn = {"scale": jnp.asarray(d[f"{prefix}_scale"]),
          "bias": jnp.asarray(d[f"{prefix}_bias"])}
    if f"{prefix}_mean" in d:
        bn["mean"] = jnp.asarray(d[f"{prefix}_mean"])
        bn["var"] = jnp.asarray(d[f"{prefix}_var"])
    return bn


def _tdnn_from(d, prefix):
    return {"w": jnp.asarray(d[f"{prefix}_w"]), "b": jnp.asarray(d[f"{prefix}_b"]),
            "bn": _bn_from(d, f"{prefix}_bn")}


def xvector_load_npz(path_or_dict) -> dict:
    """Flat npz (tdnn{i}_w/_b/_bn_* + emb_w[/emb_b]) -> xvector pytree."""
    d = np.load(path_or_dict) if isinstance(path_or_dict, (str, os.PathLike)) else path_or_dict
    params = {"tdnn": []}
    for i in range(len(XVEC_LAYERS)):
        params["tdnn"].append({
            "w": jnp.asarray(d[f"tdnn{i}_w"]),
            "b": jnp.asarray(d[f"tdnn{i}_b"]),
            "bn": _bn_from(d, f"tdnn{i}_bn"),
        })
    params["emb_w"] = jnp.asarray(d["emb_w"])
    emb_dim = params["emb_w"].shape[1]
    params["emb_b"] = jnp.asarray(d["emb_b"]) if "emb_b" in d else jnp.zeros((emb_dim,))
    return params


def ecapa_load_npz(path_or_dict, scale: int = 8) -> dict:
    """Flat npz (see tools/convert_weights.py map_ecapa_state_dict) ->
    ecapa pytree."""
    d = np.load(path_or_dict) if isinstance(path_or_dict, (str, os.PathLike)) else path_or_dict
    p = {"stem": _tdnn_from(d, "stem"), "blocks": []}
    for j in range(len(ECAPA_DILATIONS)):
        p["blocks"].append({
            "tdnn1": _tdnn_from(d, f"block{j}_tdnn1"),
            "res2net": [_tdnn_from(d, f"block{j}_res2net{i}") for i in range(scale - 1)],
            "tdnn2": _tdnn_from(d, f"block{j}_tdnn2"),
            "se1": {"w": jnp.asarray(d[f"block{j}_se1_w"]), "b": jnp.asarray(d[f"block{j}_se1_b"])},
            "se2": {"w": jnp.asarray(d[f"block{j}_se2_w"]), "b": jnp.asarray(d[f"block{j}_se2_b"])},
        })
    p["mfa"] = _tdnn_from(d, "mfa")
    p["asp_tdnn"] = _tdnn_from(d, "asp_tdnn")
    p["asp_conv"] = {"w": jnp.asarray(d["asp_conv_w"]), "b": jnp.asarray(d["asp_conv_b"])}
    p["asp_bn"] = _bn_from(d, "asp_bn")
    p["fc_w"] = jnp.asarray(d["fc_w"])
    p["fc_b"] = jnp.asarray(d["fc_b"]) if "fc_b" in d else jnp.zeros((p["fc_w"].shape[1],))
    return p


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

    def __init__(self, weights: str = None):
        weights = weights or os.environ.get("MTS_XVECTOR_WEIGHTS")
        if weights:
            self.params = xvector_load_npz(weights)
        else:
            _require_weights(self.name)
            self.params = xvector_init(jax.random.PRNGKey(0))
        self._apply = jax.jit(jax.vmap(xvector_apply, in_axes=(None, 0, 0)))

    def encode_document(self, audio, bounds, chunk=128):
        return _encode_pooled(self, audio, bounds, chunk, n_mels=24)


class EcapaEncoder:
    name = "ecapa"
    dim = 192
    frame_level = False

    def __init__(self, weights: str = None):
        weights = weights or os.environ.get("MTS_ECAPA_WEIGHTS")
        if weights:
            self.params = ecapa_load_npz(weights)
        else:
            _require_weights(self.name)
            self.params = ecapa_init(jax.random.PRNGKey(0))
        self._apply = jax.jit(jax.vmap(ecapa_apply, in_axes=(None, 0, 0)))

    def encode_document(self, audio, bounds, chunk=64):
        return _encode_pooled(self, audio, bounds, chunk, n_mels=80)


from functools import lru_cache


@lru_cache(maxsize=None)
def _fbank_batch(n_mels: int):
    """Jitted batched fbank, cached per mel count — constructing the jit
    inside every encode_document call would re-trace per document."""
    return jax.jit(jax.vmap(lambda y: _fbank(y, n_mels)))


def _encode_pooled(enc, audio, bounds, chunk, n_mels):
    units, lens = pad_units(audio, bounds, bucket=True)
    outs = []
    fb = _fbank_batch(n_mels)
    for i in range(0, len(bounds), chunk):
        n = min(chunk, len(bounds) - i)
        # row-bucket the ragged tail chunk (O(1) compiled shapes per
        # corpus); rows are independent through fbank and the per-row ASP
        # pooling, so the padded rows are simply sliced away
        u, l = bucket_rows(units[i : i + chunk], lens[i : i + chunk], 32,
                           cap=chunk)
        feats = fb(jnp.asarray(u))
        T = feats.shape[1]
        fmask = (np.arange(T)[None, :] < (1 + l[:, None] // 160)).astype(np.float32)
        emb = np.asarray(enc._apply(enc.params, feats, jnp.asarray(fmask)))
        outs.append(emb[:n])
    return [e for e in np.concatenate(outs, axis=0)]


class RandomProjectionEncoder:
    """Smoke-mode stand-in for openl3/crepe: deterministic random projection
    of log-mel statistics to the target dim."""

    def __init__(self, dim, frame_level=False):
        self.dim = dim
        self.frame_level = frame_level
        self._proj = None

    def encode_document(self, audio, bounds, chunk=256):
        # bucket=True + row bucketing keep this smoke path on the same
        # O(1)-compiled-shapes contract as the real encoders; its unmasked
        # mel statistics do shift with padding, which is immaterial for
        # random-projection embeddings
        units, lens = pad_units(audio, bounds, bucket=True)
        outs = []
        for i in range(0, len(units), chunk):
            n = min(chunk, len(units) - i)
            u, _ = bucket_rows(units[i : i + chunk], cap=chunk)
            mel = jax.vmap(lambda y: power_to_db(melspectrogram(y, SR, n_mels=64)))(
                jnp.asarray(u)
            )
            mel = np.asarray(mel)[:n]  # [B, 64, T]
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
