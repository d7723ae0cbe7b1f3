"""OpenL3 audio embedding model (Look, Listen and Learn) in JAX.

The reference calls the TF/Keras openl3 package with mel128/env/512 weights
at training time and mel256/music/512 at inference time
(/root/reference/extract_embeddings.py:147-151 vs
extract_embeddings_inference.py:107). This is the architecture re-built on
the framework's own jitted mel front-end:

  48 kHz, 1 s windows, 0.1 s hop -> mel spectrogram (128 or 256 bands)
  -> VGG-ish CNN: [64,64]+pool, [128,128]+pool, [256,256]+pool, [512,512]
  -> global max pool -> 512-d embedding per window

Weight import: `load_weights(npz_path)` accepts a converted keras weight
archive (conv kernels [kh, kw, cin, cout], batch-norm moments); the openl3
package's .h5 files convert with a one-liner outside this environment.
Random-weight smoke mode otherwise (MTS_RANDOM_ENCODER_WEIGHTS=1).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.spectral import mel_filterbank, hann_window
from ..utils.audio import resample
from .engine_util import bucket_rows

OPENL3_SR = 48000
WINDOW_S = 1.0
HOP_S = 0.1

CONV_BLOCKS = ((64, 64), (128, 128), (256, 256), (512, 512))


def openl3_init(rng, n_mels: int = 128, emb_dim: int = 512) -> dict:
    params = {"blocks": []}
    cin = 1
    for block in CONV_BLOCKS:
        layers = []
        for cout in block:
            rng, k = jax.random.split(rng)
            layers.append(
                {
                    "w": jax.random.normal(k, (3, 3, cin, cout))
                    * np.sqrt(2.0 / (9 * cin)),
                    "b": jnp.zeros((cout,)),
                    "bn": {
                        "scale": jnp.ones((cout,)),
                        "bias": jnp.zeros((cout,)),
                        "mean": jnp.zeros((cout,)),
                        "var": jnp.ones((cout,)),
                    },
                }
            )
            cin = cout
        params["blocks"].append(layers)
    return params


def _bn(p, x, eps=1e-3):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


def _mel_image(audio_win: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """[S] 48 kHz window -> [n_mels, T] dB mel image (kapre-style)."""
    n_fft, hop = 2048, 242
    from ..dsp.spectral import frame_signal

    frames = frame_signal(audio_win, n_fft, hop, center=True)
    win = jnp.asarray(hann_window(n_fft), audio_win.dtype)
    spec = jnp.abs(jnp.fft.rfft(frames * win, axis=-1)) ** 2
    bank = jnp.asarray(mel_filterbank(OPENL3_SR, n_fft, n_mels))
    mel = spec @ bank.T
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, jnp.max(db) - 80.0)
    return jnp.transpose(db)


def conv_trunk(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, 1] mel images -> [N, 512]: Conv2D(same)+BN+ReLU pairs with
    2x2 max pools between blocks, global max pool at the end (the openl3
    audio-embedding CNN from the mel image onward)."""
    for block in params["blocks"]:
        for lp in block:
            x = jax.lax.conv_general_dilated(
                x, lp["w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + lp["b"]
            x = jax.nn.relu(_bn(lp["bn"], x))
        if block is not params["blocks"][-1]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return jnp.max(x, axis=(1, 2))  # global max pool -> [N, 512]


@partial(jax.jit, static_argnames=("n_mels",))
def openl3_apply(params: dict, windows: jnp.ndarray, n_mels: int = 128) -> jnp.ndarray:
    """windows: [N, S] 1-s 48 kHz -> [N, 512] embeddings."""
    imgs = jax.vmap(lambda w: _mel_image(w, n_mels))(windows)  # [N, M, T]
    return conv_trunk(params, imgs[..., None])


def load_weights(npz_path: str, n_mels: int = 128) -> dict:
    """Converted keras weights: conv{i}_{w,b}, bn{i}_{scale,bias,mean,var}."""
    data = np.load(npz_path)
    params = openl3_init(jax.random.PRNGKey(0), n_mels)
    i = 0
    for block in params["blocks"]:
        for lp in block:
            lp["w"] = jnp.asarray(data[f"conv{i}_w"])
            lp["b"] = jnp.asarray(data[f"conv{i}_b"])
            for k in ("scale", "bias", "mean", "var"):
                lp["bn"][k] = jnp.asarray(data[f"bn{i}_{k}"])
            i += 1
    return params


class OpenL3Encoder:
    """Engine adapter: per-unit frames of 512-d window embeddings."""

    name = "openl3"
    dim = 512
    frame_level = True

    def __init__(self, n_mels: int = 128, weights: str = None):
        self.n_mels = n_mels
        # The two deployed variants (mel128/env for training-time extraction,
        # mel256/music for inference — engine.py:178) need DIFFERENT
        # converted checkpoints, and load_weights cannot tell them apart
        # (conv/bn shapes are n_mels-independent). Resolve a variant-specific
        # env var first so exporting both never cross-loads; the generic
        # MTS_OPENL3_WEIGHTS remains as a single-variant fallback.
        weights = (weights
                   or os.environ.get(f"MTS_OPENL3_WEIGHTS_MEL{n_mels}")
                   or os.environ.get("MTS_OPENL3_WEIGHTS"))
        if weights:
            self.params = load_weights(weights, n_mels)
        elif os.environ.get("MTS_RANDOM_ENCODER_WEIGHTS") == "1":
            print("WARNING: openl3 running with RANDOM weights (smoke mode)")
            self.params = openl3_init(jax.random.PRNGKey(0), n_mels)
        else:
            raise RuntimeError(
                "openl3 weights unavailable in this environment; pass a "
                "converted .npz via weights= / MTS_OPENL3_WEIGHTS or set "
                "MTS_RANDOM_ENCODER_WEIGHTS=1"
            )

    def encode_document(self, audio, bounds, chunk=64):
        """audio is 16 kHz; openl3 operates at 48 kHz with 1 s windows/0.1 s hop."""
        audio48 = resample(audio, 16000, OPENL3_SR)
        win = int(WINDOW_S * OPENL3_SR)
        hop = int(HOP_S * OPENL3_SR)
        outs = []
        for s16, e16 in bounds:
            s, e = s16 * 3, e16 * 3
            seg = audio48[s:e]
            if len(seg) < win:
                seg = np.pad(seg, (0, win - len(seg)))
            starts = np.arange(0, max(len(seg) - win, 0) + 1, hop)
            windows = np.stack([seg[st : st + win] for st in starts])
            embs = []
            for i in range(0, len(windows), chunk):
                # row-bucket the ragged tail so a corpus compiles O(1)
                # window-batch shapes (zero windows' embeddings sliced away)
                n = len(windows[i : i + chunk])
                w, _ = bucket_rows(windows[i : i + chunk], cap=chunk)
                embs.append(
                    np.asarray(
                        openl3_apply(self.params, jnp.asarray(w), self.n_mels)
                    )[:n]
                )
            outs.append(np.concatenate(embs, axis=0))
        return outs
