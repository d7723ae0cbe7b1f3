"""CREPE pitch-embedding encoder (conv stack) in JAX.

The reference imports a `TorchCrepeModel` module that is absent from its own
repo (/root/reference/extract_embeddings.py:185-195 — latent ImportError),
with a 256-d embedding per frame in the dimension tables
(train_fit.py:247, predict.py:205). This implements the CREPE architecture
(Kim et al. 2018) as the framework's own conv stack:

  1024-sample frames @16 kHz, 10 ms hop -> 6 conv1d+BN+ReLU+maxpool layers
  -> per-frame embedding; the 5th-layer activations are projected to the
  256-d embedding the reference's tables expect.

Weight import hook (`load_weights`) takes a converted npz; random-weight
smoke mode otherwise.
"""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np
from .engine_util import bucket_rows

FRAME = 1024
HOP = 160  # 10 ms at 16 kHz

# (out_channels, kernel, stride) per CREPE "large"-ish capacity
LAYERS = ((1024, 512, 4), (128, 64, 1), (128, 64, 1), (128, 64, 1), (256, 64, 1))


def crepe_init(rng, emb_dim: int = 256) -> dict:
    params = {"layers": []}
    cin = 1
    for cout, k, s in LAYERS:
        rng, key = jax.random.split(rng)
        params["layers"].append(
            {
                "w": jax.random.normal(key, (k, cin, cout)) * np.sqrt(2.0 / (k * cin)),
                "b": jnp.zeros((cout,)),
                "bn": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
                       "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))},
            }
        )
        cin = cout
    rng, key = jax.random.split(rng)
    params["proj_w"] = jax.random.normal(key, (cin, emb_dim)) * 0.02
    params["proj_b"] = jnp.zeros((emb_dim,))
    return params


def _bn(p, x, eps=1e-3):
    return (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps) * p["scale"] + p["bias"]


@jax.jit
def crepe_apply(params: dict, frames: jnp.ndarray) -> jnp.ndarray:
    """frames: [N, 1024] -> [N, 256] embeddings."""
    # per-frame standardization, as CREPE does
    mu = jnp.mean(frames, axis=-1, keepdims=True)
    sd = jnp.std(frames, axis=-1, keepdims=True) + 1e-8
    x = ((frames - mu) / sd)[..., None]  # [N, 1024, 1]
    for i, lp in enumerate(params["layers"]):
        _cout, k, s = LAYERS[i]
        x = jax.lax.conv_general_dilated(
            x, lp["w"], (s,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        ) + lp["b"]
        # CREPE block order is conv -> ReLU -> BatchNorm -> maxpool (Kim et
        # al. 2018 keras reference and the torchcrepe port the converter
        # maps weights from); BN-before-ReLU would misuse converted stats
        x = _bn(lp["bn"], jax.nn.relu(x))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 1), (1, 2, 1), "VALID"
        )
    x = jnp.max(x, axis=1)  # [N, C]
    return x @ params["proj_w"] + params["proj_b"]


def load_weights(npz_path: str) -> dict:
    data = np.load(npz_path)
    params = crepe_init(jax.random.PRNGKey(0))
    for i, lp in enumerate(params["layers"]):
        lp["w"] = jnp.asarray(data[f"conv{i}_w"])
        lp["b"] = jnp.asarray(data[f"conv{i}_b"])
        for k in ("scale", "bias", "mean", "var"):
            lp["bn"][k] = jnp.asarray(data[f"bn{i}_{k}"])
    # torchcrepe's classifier head is 360-way pitch bins; our 256-d feature
    # projection is framework-owned, so converted npz files may omit it
    if "proj_w" in data:
        params["proj_w"] = jnp.asarray(data["proj_w"])
        params["proj_b"] = jnp.asarray(data["proj_b"])
    return params


class CrepeEncoder:
    name = "crepe"
    dim = 256
    frame_level = True

    def __init__(self, weights: str = None):
        weights = weights or os.environ.get("MTS_CREPE_WEIGHTS")
        if weights:
            self.params = load_weights(weights)
        elif os.environ.get("MTS_RANDOM_ENCODER_WEIGHTS") == "1":
            print("WARNING: crepe running with RANDOM weights (smoke mode)")
            self.params = crepe_init(jax.random.PRNGKey(0))
        else:
            raise RuntimeError(
                "CREPE weights unavailable (the reference's TorchCrepeModel "
                "module is absent from its own repo); pass weights= / "
                "MTS_CREPE_WEIGHTS or set MTS_RANDOM_ENCODER_WEIGHTS=1"
            )

    def encode_document(self, audio, bounds, chunk=512):
        outs = []
        for s, e in bounds:
            seg = audio[s:e]
            if len(seg) < FRAME:
                seg = np.pad(seg, (0, FRAME - len(seg)))
            starts = np.arange(0, len(seg) - FRAME + 1, HOP)
            frames = np.stack([seg[st : st + FRAME] for st in starts])
            embs = []
            for i in range(0, len(frames), chunk):
                # row-bucket the ragged tail (O(1) compiled batch shapes
                # per corpus; zero-frame rows sliced away)
                n = len(frames[i : i + chunk])
                f, _ = bucket_rows(frames[i : i + chunk], cap=chunk)
                embs.append(np.asarray(crepe_apply(self.params, jnp.asarray(f)))[:n])
            outs.append(np.concatenate(embs, axis=0))
        return outs
