"""The BiLSTM tagger family.

TPU-native re-implementations of the reference zoo
(/root/reference/models/CRF.py): every class follows the base.py contract
(`init` / `scores` / `loss` / `decode`) and replicates the reference's
loss/decode semantics. Where the reference has a defect we do not copy it
blindly (noted per class).

Implemented here: BiLSTM, BiLSTMLateFusion, BiRnnCrf, SimpleBiLSTM, MLP,
SheikhBiLSTM, SwitchBiLSTM. Attention-based taggers live in
models/transformers.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import crf as crf_lib
from ..ops import losses as losses_lib
from ..ops.masks import length_mask
from ..ops.rnn import bidirectional_rnn, lstm_params, gru_params, unidirectional_rnn
from .base import (
    TaggerConfig,
    dropout,
    head_decode,
    head_loss,
    linear,
    linear_params,
)


def _head_dim(cfg: TaggerConfig) -> int:
    return cfg.tagset_size if cfg.loss_fn == "CrossEntropy" else 1


def rnn_stack_params(rng, cfg: TaggerConfig, in_dim: int) -> list:
    """Multi-layer (bi)directional recurrent stack (reference RNN wrapper,
    models/NeuralArchitectures.py:23-146; stacking via nn.LSTM num_layers)."""
    layers = []
    make = lstm_params if cfg.lstm else gru_params
    for i in range(cfg.num_layers):
        rng, kf, kb = jax.random.split(rng, 3)
        d = in_dim if i == 0 else (2 * cfg.hidden_dim if cfg.bidirectional else cfg.hidden_dim)
        layer = {"fwd": make(kf, d, cfg.hidden_dim)}
        if cfg.bidirectional:
            layer["bwd"] = make(kb, d, cfg.hidden_dim)
        layers.append(layer)
    return layers


def rnn_stack_apply(
    layers: list,
    cfg: TaggerConfig,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    train: bool = False,
    rng=None,
    rates=None,
) -> jnp.ndarray:
    """Apply the stack with dropout_in before and dropout_out after
    (reference applies F.dropout outside the packed LSTM,
    NeuralArchitectures.py:92-119). `rates` = (dropout_in, dropout_out)
    overrides the config's static floats — possibly with traced scalars,
    which is how the lockstep grid trainer varies dropout per config."""
    cell = "lstm" if cfg.lstm else "gru"
    din, dout = rates if rates is not None else (cfg.dropout_in, cfg.dropout_out)
    if rng is not None:
        rng, k_in, k_out = jax.random.split(rng, 3)
    else:
        k_in = k_out = None
    h = dropout(x, din, k_in, deterministic=not train)
    for layer in layers:
        if cfg.bidirectional:
            h = bidirectional_rnn(layer["fwd"], layer["bwd"], h, lengths, cell)
        else:
            h = unidirectional_rnn(layer["fwd"], h, lengths, cell)
    return dropout(h, dout, k_out, deterministic=not train)


class BiLSTMTagger:
    """BiLSTM -> Linear head -> CE/BCE/Focal + threshold decode
    (reference BiLSTM, models/CRF.py:274-369)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        out_dim = 2 * self.cfg.hidden_dim if self.cfg.bidirectional else self.cfg.hidden_dim
        return {
            "rnn": rnn_stack_params(k1, self.cfg, self.cfg.embedding_dim),
            "cls": linear_params(k2, out_dim, _head_dim(self.cfg)),
        }

    def scores(self, params, x, lengths, train=False, rng=None) -> jnp.ndarray:
        h = rnn_stack_apply(params["rnn"], self.cfg, x, lengths, train, rng)
        return linear(params["cls"], h)

    def loss(self, params, x, lengths, tags, rng=None, dropout_rates=None) -> jnp.ndarray:
        h = rnn_stack_apply(
            params["rnn"], self.cfg, x, lengths, train=True, rng=rng,
            rates=dropout_rates,
        )
        logits = linear(params["cls"], h)
        loss = head_loss(self.cfg, logits, lengths, tags)
        if self.cfg.cosine_loss:
            from ..ops.cosine_loss import cosine_segment_loss

            loss = loss + 0.1 * cosine_segment_loss(h, lengths, tags)
        return loss

    def decode(self, params, x, lengths, threshold: float):
        logits = self.scores(params, x, lengths)
        return logits, head_decode(self.cfg, logits, threshold)


class BiLSTMLateFusion:
    """Two parallel RNN towers over separate modalities, concatenated hidden
    states, single classifier (reference BiLSTMLateFusion, models/CRF.py:371-479)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "rnn1": rnn_stack_params(k1, self.cfg, self.cfg.embedding_dim),
            "rnn2": rnn_stack_params(k2, self.cfg, self.cfg.embedding_dim2),
            "cls": linear_params(k3, 4 * self.cfg.hidden_dim, _head_dim(self.cfg)),
        }

    def scores(self, params, x, lengths, train=False, rng=None, x2=None) -> jnp.ndarray:
        return linear(params["cls"], self._hidden(params, x, lengths, train, rng, x2))

    def _hidden(self, params, x, lengths, train, rng, x2, rates=None):
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        else:
            r1 = r2 = None
        h1 = rnn_stack_apply(params["rnn1"], self.cfg, x, lengths, train, r1, rates)
        h2 = rnn_stack_apply(params["rnn2"], self.cfg, x2, lengths, train, r2, rates)
        return jnp.concatenate([h1, h2], axis=-1)

    def loss(self, params, x, lengths, tags, rng=None, x2=None,
             dropout_rates=None) -> jnp.ndarray:
        h = self._hidden(params, x, lengths, True, rng, x2, rates=dropout_rates)
        logits = linear(params["cls"], h)
        loss = head_loss(self.cfg, logits, lengths, tags)
        if self.cfg.cosine_loss:
            from ..ops.cosine_loss import cosine_segment_loss

            loss = loss + 0.1 * cosine_segment_loss(h, lengths, tags)
        return loss

    def decode(self, params, x, lengths, threshold: float, x2=None):
        logits = self.scores(params, x, lengths, x2=x2)
        return logits, head_decode(self.cfg, logits, threshold)


class BiRnnCrf:
    """BiLSTM emissions -> linear-chain CRF with on-device Viterbi
    (reference BiRnnCrf, models/CRF.py:243-272)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        return {
            "rnn": rnn_stack_params(k1, self.cfg, self.cfg.embedding_dim),
            "crf": crf_lib.crf_params(k2, 2 * self.cfg.hidden_dim, self.cfg.tagset_size),
        }

    def loss(self, params, x, lengths, tags, rng=None) -> jnp.ndarray:
        mask = length_mask(lengths, x.shape[1], x.dtype)
        h = rnn_stack_apply(params["rnn"], self.cfg, x, lengths, train=True, rng=rng)
        # padded tags may be -1 (dataset CRF flag off) or 0; CRF expects valid ids
        safe_tags = jnp.maximum(tags.astype(jnp.int32), 0)
        return crf_lib.crf_loss(params["crf"], h, safe_tags, mask)

    def decode(self, params, x, lengths, threshold: float = None):
        mask = length_mask(lengths, x.shape[1], x.dtype)
        h = rnn_stack_apply(params["rnn"], self.cfg, x, lengths)
        score, paths = crf_lib.viterbi_decode(params["crf"], h, mask)
        return score, paths.astype(bool)


class SimpleBiLSTM:
    """Plain nn.LSTM + sigmoid head (reference SimpleBiLSTM, models/CRF.py:895-977).

    Divergence from the reference (documented, not copied): the reference's
    BCE runs over padded positions too (and its forward crashes on the
    undefined `self.th`); here padding is masked and threshold defaults 0.4.
    """

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        layers = []
        for i in range(self.cfg.num_layers):
            k1, kf, kb = jax.random.split(k1, 3)
            d = self.cfg.embedding_dim if i == 0 else 2 * self.cfg.hidden_dim
            layers.append(
                {"fwd": lstm_params(kf, d, self.cfg.hidden_dim),
                 "bwd": lstm_params(kb, d, self.cfg.hidden_dim)}
            )
        return {"rnn": layers, "cls": linear_params(k2, 2 * self.cfg.hidden_dim, 1)}

    def scores(self, params, x, lengths, train=False, rng=None) -> jnp.ndarray:
        h = x
        for layer in params["rnn"]:
            h = bidirectional_rnn(layer["fwd"], layer["bwd"], h, lengths, "lstm")
        return linear(params["cls"], h)

    def loss(self, params, x, lengths, tags, rng=None) -> jnp.ndarray:
        logits = self.scores(params, x, lengths, train=True, rng=rng)
        mask = length_mask(lengths, x.shape[1], x.dtype).reshape(-1)
        t = jnp.where(mask > 0, tags.reshape(-1).astype(x.dtype), 0.0)
        return losses_lib.bce_loss(logits[..., 0].reshape(-1), t, mask)

    def decode(self, params, x, lengths, threshold: float):
        logits = self.scores(params, x, lengths)
        return logits, jax.nn.sigmoid(logits[..., 0]) > threshold


class MLPTagger:
    """Per-unit MLP with sigmoid head (reference MLP, models/CRF.py:860-892);
    padding masked here instead of scored."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        layers = []
        d = self.cfg.embedding_dim
        for _ in range(self.cfg.num_layers):
            rng, k = jax.random.split(rng)
            layers.append(linear_params(k, d, self.cfg.hidden_dim))
            d = self.cfg.hidden_dim
        rng, k = jax.random.split(rng)
        return {"layers": layers, "cls": linear_params(k, d, 1)}

    def scores(self, params, x, lengths, train=False, rng=None) -> jnp.ndarray:
        h = x
        for p in params["layers"]:
            h = jax.nn.relu(linear(p, h))
        return linear(params["cls"], h)

    def loss(self, params, x, lengths, tags, rng=None) -> jnp.ndarray:
        logits = self.scores(params, x, lengths)
        mask = length_mask(lengths, x.shape[1], x.dtype).reshape(-1)
        t = jnp.where(mask > 0, tags.reshape(-1).astype(x.dtype), 0.0)
        return losses_lib.bce_loss(logits[..., 0].reshape(-1), t, mask)

    def decode(self, params, x, lengths, threshold: float):
        logits = self.scores(params, x, lengths)
        return logits, jax.nn.sigmoid(logits[..., 0]) > threshold


class SheikhBiLSTM:
    """Forward/backward-state coherence scorer (Sheikh et al.): dot product of
    projected forward states at t and backward states at t+1, label-inverted
    BCE (reference SheikhBiLSTM, models/CRF.py:980-1041)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        return {
            "rnn": rnn_stack_params(k1, self.cfg, self.cfg.embedding_dim),
            "fwd_dense": linear_params(k2, self.cfg.hidden_dim, self.cfg.hidden_dim),
            "bwd_dense": linear_params(k3, self.cfg.hidden_dim, self.cfg.hidden_dim),
        }

    def _coherence(self, params, x, lengths, train, rng) -> jnp.ndarray:
        h = rnn_stack_apply(params["rnn"], self.cfg, x, lengths, train, rng)
        B, L, _ = h.shape
        h = h.reshape(B, L, 2, self.cfg.hidden_dim)
        x_for = linear(params["fwd_dense"], h[:, :-1, 0, :])
        x_bac = linear(params["bwd_dense"], h[:, 1:, 1, :])
        return jnp.sum(x_for * x_bac, axis=-1)  # [B, L-1]

    def loss(self, params, x, lengths, tags, rng=None) -> jnp.ndarray:
        dot = self._coherence(params, x, lengths, train=True, rng=rng)
        B, Lm1 = dot.shape
        # targets inverted: coherent (no boundary) -> 1
        inv = 1.0 - tags[:, :Lm1].astype(x.dtype)
        probs = 1.0 - jax.nn.sigmoid(dot)
        mask = length_mask(lengths - 1, Lm1, x.dtype)
        inv = jnp.where(mask > 0, inv, 0.0)
        eps = 1e-7
        bce = -(inv * jnp.log(probs + eps) + (1 - inv) * jnp.log(1 - probs + eps))
        return jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def decode(self, params, x, lengths, threshold: float):
        dot = self._coherence(params, x, lengths, train=False, rng=None)
        B = dot.shape[0]
        scores = jnp.concatenate([dot, jnp.ones((B, 1), dot.dtype)], axis=1)
        tags = (1.0 - jax.nn.sigmoid(scores)) < threshold
        return scores[..., None], tags


class SwitchBiLSTM:
    """Domain-adaptive BiLSTM: per-domain LSTM towers or per-domain dense
    heads selected by a [B] domain flag (reference SwitchBiLSTM,
    models/CRF.py:1046-1270). Both branches run on the full batch and are
    selected per-sample — identical math, jit-friendly."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        out_dim = 2 * self.cfg.hidden_dim if self.cfg.bidirectional else self.cfg.hidden_dim
        if self.cfg.switch == "lstm":
            k1, k2, k3 = jax.random.split(rng, 3)
            return {
                "rnn1": rnn_stack_params(k1, self.cfg, self.cfg.embedding_dim),
                "rnn2": rnn_stack_params(k2, self.cfg, self.cfg.embedding_dim),
                "cls": linear_params(k3, out_dim, _head_dim(self.cfg)),
            }
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "rnn": rnn_stack_params(k1, self.cfg, self.cfg.embedding_dim),
            "cls1": linear_params(k2, out_dim, _head_dim(self.cfg)),
            "cls2": linear_params(k3, out_dim, _head_dim(self.cfg)),
        }

    def scores(self, params, x, lengths, domains, train=False, rng=None) -> jnp.ndarray:
        dom = domains.astype(bool)[:, None, None]
        if self.cfg.switch == "lstm":
            if rng is not None:
                r1, r2 = jax.random.split(rng)
            else:
                r1 = r2 = None
            h1 = rnn_stack_apply(params["rnn1"], self.cfg, x, lengths, train, r1)
            h2 = rnn_stack_apply(params["rnn2"], self.cfg, x, lengths, train, r2)
            h = jnp.where(dom, h1, h2)
            return linear(params["cls"], h)
        h = rnn_stack_apply(params["rnn"], self.cfg, x, lengths, train, rng)
        return jnp.where(dom, linear(params["cls1"], h), linear(params["cls2"], h))

    def loss(self, params, x, lengths, tags, domains, rng=None) -> jnp.ndarray:
        logits = self.scores(params, x, lengths, domains, train=True, rng=rng)
        return head_loss(self.cfg, logits, lengths, tags)

    def decode(self, params, x, lengths, domains, threshold: float):
        logits = self.scores(params, x, lengths, domains)
        return logits, head_decode(self.cfg, logits, threshold)
