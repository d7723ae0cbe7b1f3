"""Common tagger contract.

Every architecture in the zoo mirrors the reference's module API
(`loss(x, lengths, tags)` / `forward(x, lengths) -> (scores, tags)`,
e.g. /root/reference/models/CRF.py:319-369) but as pure functions over an
explicit parameter pytree so the whole step jits / pjits:

    arch = BiLSTMTagger(cfg)
    params = arch.init(rng)
    loss = arch.loss(params, x, lengths, tags, rngs)       # scalar
    scores = arch.scores(params, x, lengths)               # [B, L, C]
    tags = arch.decode(params, x, lengths, threshold)      # bool [B, L]

Decode stays ON DEVICE ([B, L] bool + mask), unlike the reference's
per-sample Python list building (models/CRF.py:369); hosts slice to lengths
only at the metrics epilogue.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import losses as losses_lib
from ..ops.masks import length_mask


@dataclasses.dataclass(frozen=True)
class TaggerConfig:
    """Static hyperparameters shared by the zoo (reference flag names kept)."""

    embedding_dim: int = 768
    hidden_dim: int = 256
    num_layers: int = 2
    tagset_size: int = 2
    bidirectional: bool = True
    lstm: bool = True  # False -> GRU (reference --NoLSTM)
    dropout_in: float = 0.0
    dropout_out: float = 0.0
    loss_fn: str = "CrossEntropy"  # CrossEntropy | BinaryCrossEntropy | FocalLoss
    alpha: float = 0.9
    gamma: float = 2.0
    threshold: Optional[float] = None
    nheads: int = 8
    attention_window: int = 120
    positional_encoding: bool = True
    # second modality input dim for late fusion
    embedding_dim2: int = 0
    # SwitchBiLSTM adaptation mode: 'dense' | 'lstm'
    switch: str = "dense"
    # auxiliary segment-coherence cosine loss, weighted 0.1 (reference -cos)
    cosine_loss: bool = False
    dtype: object = jnp.float32


def head_loss(
    cfg: TaggerConfig,
    logits: jnp.ndarray,
    lengths: jnp.ndarray,
    tags: jnp.ndarray,
) -> jnp.ndarray:
    """Shared classification-head loss used by every non-CRF tagger.

    Replicates the reference's three branches (models/CRF.py:331-356):
    BCE/Focal over unpadded positions; CE over ALL positions relying on the
    -1 ignore_index padding convention.
    """
    B, L = logits.shape[:2]
    if cfg.loss_fn == "CrossEntropy":
        return losses_lib.cross_entropy_ignore_index(
            logits.reshape(-1, cfg.tagset_size), tags.reshape(-1).astype(jnp.int32)
        )
    mask = length_mask(lengths, L, logits.dtype).reshape(-1)
    flat = logits[..., 0].reshape(-1)
    t = tags.reshape(-1).astype(logits.dtype)
    t = jnp.where(mask > 0, t, 0.0)  # padded tags may be -1; masked out anyway
    if cfg.loss_fn == "FocalLoss":
        return losses_lib.sigmoid_focal_loss(flat, t, mask, cfg.alpha, cfg.gamma)
    return losses_lib.bce_loss(flat, t, mask)


def head_decode(cfg: TaggerConfig, logits: jnp.ndarray, threshold) -> jnp.ndarray:
    """scores -> boolean boundary tags, matching models/CRF.py:362-368."""
    if cfg.loss_fn == "CrossEntropy":
        probs = jax.nn.softmax(logits, axis=-1)[..., 1]
    else:
        probs = jax.nn.sigmoid(logits[..., 0])
    return probs > threshold


def dropout(x: jnp.ndarray, rate, rng, deterministic: bool) -> jnp.ndarray:
    """`rate` may be a Python float or a TRACED scalar (the vmapped grid
    trainer varies it across lockstep configurations)."""
    if deterministic or rng is None:
        return x
    if not isinstance(rate, jnp.ndarray) and rate == 0.0:
        return x
    keep = 1.0 - rate
    m = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(m, x / keep, 0.0)


def linear_params(rng, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: kaiming_uniform_(a=sqrt(5)) works out to
    U(+-1/sqrt(fan_in)) for both weight and bias."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_dim)
    w = jax.random.uniform(k1, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(k2, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def xavier_linear_params(rng, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """Reference 'fc' init: xavier-uniform weight, zero bias."""
    w = jax.nn.initializers.xavier_uniform()(rng, (in_dim, out_dim), dtype)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]
