"""Attention-based taggers: transformer / Longformer / LongT5 families.

Capability-parity re-implementations of the reference's HF-config-based
encoders (/root/reference/models/RestrictedTransformerLayer.py) and the
taggers built on them (/root/reference/models/CRF.py:481-858). The reference
instantiates HF models from *config* — all weights are randomly initialized,
never pretrained — so parity here means identical architecture family,
window semantics, dimensions and layer structure, not weight-level porting:

- ClassicTransformerEncoder: BERT-style post-LN encoder over inputs_embeds
  with learned absolute position embeddings (Classic_Transformer, :16-63)
- LongformerEncoder: the same block with sliding-window attention and a
  per-layer window list (Longformer_Local_Attention, :66-133); the
  pyramidal schedule `[w*k for k in L..1]` comes from models/CRF.py:529
- LongformerMHABlock: the "noffn" single layer used as a bare local-MHA
  block with an optional external KEY stream (the vendored longformer_noffn
  pyc's LongformerLayer with external_input, which feeds only the key
  projection — queries and values stay on the input stream; call site
  models/CRF.py:673-679, glue recovered in tests/test_reference_pyc_glue.py)
- LongT5Encoder: T5-style pre-RMSNorm blocks with local attention +
  relative-position-bucket bias (LongT5, :135-187; bucket derivation
  replicates the reference expression `max(4, window+1//4)` == max(4, w))
- Taggers: TransformerSegmenter, TransformerCRF, RecurrentLongT5,
  RecurrentLongformer (LSTM <-> local-attention hybrid blocks with the
  separate forward/backward query/key trick, models/CRF.py:613-858)

All attention runs through ops.attention.local_attention (Pallas kernel on
TPU, blocked XLA elsewhere); everything is static-shape and jit-safe.
"""
from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp

from ..ops import crf as crf_lib
from ..ops.attention import (
    dense_attention,
    flash_attention_active,
    local_attention,
    merge_heads,
    relative_bias_fn,
    split_heads,
)
from ..ops.masks import length_mask
from ..ops.rnn import lstm_params, bidirectional_rnn
from .base import (
    TaggerConfig,
    dropout,
    head_decode,
    head_loss,
    linear,
    linear_params,
)


def layer_norm(p, x, eps=1e-12):
    """eps matches HF BertConfig/LongformerConfig's default 1e-12: the
    reference passes layer_norm_eps=1e-5 into its wrapper classes but never
    writes it onto the HF config (RestrictedTransformerLayer.py:82-92), so
    the models it actually runs use 1e-12."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def rms_norm(p, x, eps=1e-6):
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * p["scale"]


def ln_params(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def rms_params(dim):
    return {"scale": jnp.ones((dim,))}


def mha_params(rng, d_model):
    ks = jax.random.split(rng, 4)
    return {
        "q": linear_params(ks[0], d_model, d_model),
        "k": linear_params(ks[1], d_model, d_model),
        "v": linear_params(ks[2], d_model, d_model),
        "o": linear_params(ks[3], d_model, d_model),
    }


def _attend(p, x, nheads, mask, window=None, bias_fn=None, scale=True,
            probs_drop=0.0, rng=None):
    """MHA with optional sliding window. probs_drop/rng: train-time
    attention-probs dropout (HF semantics; rng=None at eval)."""
    q = split_heads(linear(p["q"], x), nheads)
    k = split_heads(linear(p["k"], x), nheads)
    v = split_heads(linear(p["v"], x), nheads)
    if window is None:
        out = dense_attention(q, k, v, mask, probs_drop=probs_drop, rng=rng)
    else:
        out = local_attention(q, k, v, window, mask, bias_fn=bias_fn, scale=scale,
                              probs_drop=probs_drop, rng=rng)
    return linear(p["o"], merge_heads(out))


# ---------------------------------------------------------------------------
# BERT-style post-LN encoder (Classic / Longformer)
# ---------------------------------------------------------------------------


def bert_layer_params(rng, d_model, d_ff):
    ks = jax.random.split(rng, 3)
    return {
        "attn": mha_params(ks[0], d_model),
        "ln1": ln_params(d_model),
        "ff1": linear_params(ks[1], d_model, d_ff),
        "ff2": linear_params(ks[2], d_ff, d_model),
        "ln2": ln_params(d_model),
    }


def bert_layer_apply(p, x, nheads, mask, window=None, train=False, rng=None,
                     drop=0.0, attn_drop=0.0, attend_fn=None):
    """`attend_fn(p_attn, x, mask, window)` overrides the attention op —
    the sequence-parallel path substitutes a halo-exchange variant (which
    skips attention-probs dropout); every other sublayer is per-position
    and shards trivially. `attn_drop` is HF attention_probs_dropout_prob
    (the reference maps dropout_out there for the restricted family,
    RestrictedTransformerLayer.py:92)."""
    if rng is not None:
        rng, k0, k1, k2 = jax.random.split(rng, 4)
    else:
        k0 = k1 = k2 = None
    if attend_fn is not None:
        a = attend_fn(p["attn"], x, mask, window)
    else:
        a = _attend(p["attn"], x, nheads, mask, window,
                    probs_drop=attn_drop if train else 0.0,
                    rng=k0 if train else None)
    x = layer_norm(p["ln1"], x + dropout(a, drop, k1, not train))
    h = jax.nn.gelu(linear(p["ff1"], x))
    h = linear(p["ff2"], h)
    x = layer_norm(p["ln2"], x + dropout(h, drop, k2, not train))
    return x


# Stored-activation headroom the auto-remat policy is willing to spend
# (16 GB v5e HBM; leaves >3/4 for params, optimizer state, gradients and
# the working set). Calibrated against XLA's compiled temp allocation at
# the flagship 10x3600 shape — see _auto_remat and docs/PERFORMANCE.md.
_REMAT_AUTO_BUDGET = 4 << 30


def _auto_remat(B, L, d_model, d_ff, nheads, layer_windows, share=1,
                attn_drop=0.0):
    """Trace-time per-layer rematerialization policy: store activations
    when they comfortably fit, recompute when they would not.

    Shapes are static under jit, so the choice is made per compiled
    program. Remat was originally unconditional because the XLA banded
    attention path materializes a [B,H,nb,block,3*block] score tensor per
    layer (~GBs at the 3600-unit budget); the flash Pallas pairs (round 4)
    keep score tiles in VMEM, which makes storing the remaining layer
    activations cheap — measured 67.6 -> 50.1 ms/step at the flagship
    10x3600 Longformer config and 117.7 -> 106.4 ms for RecurrentLongT5
    (scripts/bench_longdoc_attention.py with MTS_REMAT=0).

    Policy: on TPU with flash attention active, estimate the stored bytes
    (~12 d_model-wide unit tensors + 2 d_ff-wide FFN intermediates per
    layer, plus dense-layer softmax weights where a layer has no window;
    flagship estimate 2.8 GB vs 2.28 GB measured compiled temp; with active
    probs dropout, plus the largest layer's transient flash dropout mask)
    and turn remat OFF when `share` sibling encoder stacks of this size
    stay under _REMAT_AUTO_BUDGET. Anywhere the banded XLA path serves (CPU, or
    MTS_FLASH_ATTENTION=0), remat stays ON. MTS_REMAT=1/0 overrides the
    heuristic in either direction.
    """
    env = os.environ.get("MTS_REMAT")
    if env is not None:
        return env != "0"
    from ..ops.attention import _flash_default

    if jax.devices()[0].platform != "tpu" or not _flash_default():
        return True
    est = 0
    mask_temp = 0
    for w in layer_windows:
        est += B * L * (12 * d_model + 2 * d_ff) * 4
        if w is None:  # dense layer: stored softmax weights dominate
            est += 2 * B * nheads * L * L * 4
        elif attn_drop and attn_drop > 0.0:
            # the dropped flash pair materializes an f32
            # [B*H, nb*block, 3*block] 0/1 mask in HBM for the forward and
            # regenerates it in the backward (ops/pallas_attention._drop_mask
            # — a transient, NOT a stored residual, so only the largest
            # layer's mask is alive at once; ~0.4 GB at the flagship shape).
            # Block geometry must mirror the kernel's _flash_geometry, incl.
            # the MTS_FLASH_BLOCK_QUANT widening knob.
            from ..ops.pallas_attention import _flash_geometry

            block, nb, _pad = _flash_geometry(L, w // 2)
            mask_temp = max(mask_temp, B * nheads * nb * block * 3 * block * 4)
    return (est + mask_temp) * share > _REMAT_AUTO_BUDGET


class _BertStyleEncoder:
    """Shared machinery for Classic / Longformer encoders.

    `remat=None` (default) resolves per compiled program via _auto_remat:
    rematerialize each layer in the backward pass (jax.checkpoint) unless
    flash attention is active and the stored activations fit comfortably.
    At the reference's 3600-unit budget the XLA path's banded attention
    scores alone are ~GBs per layer, so training long documents there
    needs recompute-instead-of-store.
    """

    def __init__(self, d_model, nheads, n_layers, d_ff, windows, drop,
                 max_position=4096, remat=None, attn_drop=0.0):
        self.d_model = d_model
        self.nheads = nheads
        self.n_layers = n_layers
        self.d_ff = d_ff
        self.windows = windows  # None (dense) or per-layer window list
        self.drop = drop
        self.attn_drop = attn_drop  # HF attention_probs_dropout_prob
        self.max_position = max_position
        self.remat = remat  # True/False forces; None = auto policy

    def init(self, rng):
        ks = jax.random.split(rng, self.n_layers + 2)
        return {
            "pos": jax.random.normal(ks[0], (self.max_position, self.d_model)) * 0.02,
            "ln_emb": ln_params(self.d_model),
            "layers": [
                bert_layer_params(ks[i + 1], self.d_model, self.d_ff)
                for i in range(self.n_layers)
            ],
        }

    def apply(self, p, x, lengths, train=False, rng=None, attend_fn=None,
              pos_offset=None, mask=None):
        """`pos_offset`/`mask`/`attend_fn` support the sequence-parallel
        path, where x holds only this shard's units: the positional table is
        sliced at the shard's GLOBAL offset (possibly traced) and the mask
        comes precomputed from global positions."""
        B, L, _ = x.shape
        if mask is None:
            mask = length_mask(lengths, L, x.dtype)
        if pos_offset is None:
            pos = p["pos"][:L]
        else:
            pos = jax.lax.dynamic_slice_in_dim(p["pos"], pos_offset, L)
        x = x + pos[None]
        x = layer_norm(p["ln_emb"], x)
        # HF BertEmbeddings/LongformerEmbeddings drop the normalized
        # embeddings at hidden_dropout_prob in training
        if rng is not None:
            rng, k_emb = jax.random.split(rng)
            x = dropout(x, self.drop, k_emb, not train)
        for i, lp in enumerate(p["layers"]):
            w = None if self.windows is None else self.windows[i]
            if rng is not None:
                rng, k = jax.random.split(rng)
            else:
                k = None

            def one_layer(lp, x, mask, k, _w=w):
                return bert_layer_apply(
                    lp, x, self.nheads, mask, window=_w, train=train, rng=k,
                    drop=self.drop, attn_drop=self.attn_drop,
                    attend_fn=attend_fn,
                )

            # active attention-probs dropout rides the dropped flash pair
            # (mask regenerated from the key in backward), so only a
            # SUBSTITUTED attention op (the sequence-parallel halo variant)
            # or flash being off still forces the banded XLA path
            drop_here = rng is not None and self.attn_drop > 0.0
            banded = attend_fn is not None or (
                drop_here and not flash_attention_active()
            )
            if train and self._use_remat(B, L, banded):
                one_layer = jax.checkpoint(one_layer)
            x = one_layer(lp, x, mask, k)
        return x

    def _use_remat(self, B, L, banded=False):
        if self.remat is not None:
            return self.remat
        if banded:
            # the banded XLA attention path will serve this program — a
            # substituted attention op (the sequence-parallel halo variant,
            # parallel/sequence.py use_pallas=False: halo'd masks are not
            # prefix masks), or dropout with flash disabled/off-TPU. Its
            # stored score tensors are not in the estimate below — keep
            # remat unless forced.
            return os.environ.get("MTS_REMAT", "1") != "0"
        windows = self.windows if self.windows is not None else [None] * self.n_layers
        return _auto_remat(B, L, self.d_model, self.d_ff, self.nheads, windows,
                           attn_drop=self.attn_drop)


# ---------------------------------------------------------------------------
# LongT5-style pre-RMSNorm encoder with relative-bucket local attention
# ---------------------------------------------------------------------------


class LongT5Encoder:
    def __init__(self, d_model, nheads, n_layers, d_ff, window, drop, remat=None,
                 remat_share=1):
        self.d_model = d_model
        self.nheads = nheads
        self.n_layers = n_layers
        self.d_ff = d_ff
        # reference expression max(4, window_size + 1//4) == max(4, window)
        self.num_buckets = max(4, window)
        self.max_distance = window + 1
        # `window` is HF LongT5's local_radius: each token attends |i-j| <= r
        # (modeling_longt5._mask_local_attention_mask: |rel| < block_len with
        # block_len = r+1), so the two-sided band width is 2r
        self.window = 2 * window
        self.drop = drop
        self.remat = remat  # True/False forces; None = auto policy
        # sibling encoder stacks sharing the auto-remat budget (RecurrentLongT5
        # interleaves num_layers single-layer stacks in one loss)
        self.remat_share = remat_share

    def init(self, rng):
        ks = jax.random.split(rng, self.n_layers + 2)
        layers = []
        for i in range(self.n_layers):
            k = jax.random.split(ks[i], 4)
            layers.append(
                {
                    "attn": mha_params(k[0], self.d_model),
                    "ln1": rms_params(self.d_model),
                    "wi": linear_params(k[1], self.d_model, self.d_ff),
                    "wo": linear_params(k[2], self.d_ff, self.d_model),
                    "ln2": rms_params(self.d_model),
                }
            )
        bias = jax.random.normal(ks[-1], (self.num_buckets, self.nheads)) * 0.02
        return {"layers": layers, "rel_bias": bias, "ln_final": rms_params(self.d_model)}

    def apply(self, p, x, lengths, train=False, rng=None):
        B, L, _ = x.shape
        mask = length_mask(lengths, L, x.dtype)
        for lp in p["layers"]:
            if rng is not None:
                rng, k0, k1, k2 = jax.random.split(rng, 4)
            else:
                k0 = k1 = k2 = None

            def one_block(lp, x, mask, rel_bias, k0, k1, k2):
                bias = relative_bias_fn(rel_bias, self.num_buckets, self.max_distance)
                h = rms_norm(lp["ln1"], x)
                # scale=False: T5-family attention has no sqrt(dh) scaling;
                # HF T5Attention drops the softmaxed weights at dropout_rate
                a = _attend(lp["attn"], h, self.nheads, mask, self.window,
                            bias_fn=bias, scale=False,
                            probs_drop=self.drop if train else 0.0,
                            rng=k0 if train else None)
                x = x + dropout(a, self.drop, k1, not train)
                h = rms_norm(lp["ln2"], x)
                h = linear(lp["wo"], jax.nn.relu(linear(lp["wi"], h)))
                return x + dropout(h, self.drop, k2, not train)

            # a TRACED dropout rate (vmapped grid) can't be a static
            # custom_vjp arg, so only that case — or flash off — still
            # lands on the banded XLA path under active dropout
            traced_rate = not isinstance(self.drop, (int, float))
            drop_here = rng is not None and (traced_rate or self.drop > 0.0)
            banded = drop_here and (traced_rate or not flash_attention_active())
            if train and self._use_remat(B, L, banded):
                one_block = jax.checkpoint(one_block)
            x = one_block(lp, x, mask, p["rel_bias"], k0, k1, k2)
        return rms_norm(p["ln_final"], x)

    def _use_remat(self, B, L, banded=False):
        if self.remat is not None:
            return self.remat
        if banded:
            # this program lands on the banded XLA path (traced dropout
            # rate, or flash disabled/off-TPU) — keep remat unless forced
            return os.environ.get("MTS_REMAT", "1") != "0"
        # probs dropout here is self.drop (HF T5Attention uses dropout_rate
        # for the softmaxed weights); a traced rate never reaches this
        # branch (banded=True above)
        rate = self.drop if isinstance(self.drop, (int, float)) else 0.0
        return _auto_remat(B, L, self.d_model, self.d_ff, self.nheads,
                           [self.window] * self.n_layers, share=self.remat_share,
                           attn_drop=rate)


# ---------------------------------------------------------------------------
# Taggers
# ---------------------------------------------------------------------------


def pyramidal_windows(window: int, n_layers: int) -> List[int]:
    """[w*k for k in n_layers..1] (models/CRF.py:529); forced even."""
    ws = [window * k for k in range(n_layers, 0, -1)]
    return [w if w % 2 == 0 else w + 1 for w in ws]


class TransformerSegmenter:
    """Pyramidal local-attention encoder + classification head
    (reference Transformer_segmenter, models/CRF.py:508-610).

    Train-time dropout mirrors the reference's HF configs: hidden dropout =
    dropout_in, attention-probs dropout = dropout_out on the restricted
    path (RestrictedTransformerLayer.py:85,92). The dense path
    (restricted=False) never overrides attention_probs_dropout_prob, so it
    trains at BertConfig's DEFAULT 0.1 regardless of flags
    (RestrictedTransformerLayer.py:27-35) — replicated deliberately."""

    def __init__(self, cfg: TaggerConfig, restricted: bool = True):
        self.cfg = cfg
        windows = pyramidal_windows(cfg.attention_window, cfg.num_layers) if restricted else None
        self.encoder = _BertStyleEncoder(
            cfg.embedding_dim, cfg.nheads, cfg.num_layers, cfg.hidden_dim,
            windows, cfg.dropout_in,
            attn_drop=cfg.dropout_out if restricted else 0.1,
        )

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        out = self.cfg.tagset_size if self.cfg.loss_fn == "CrossEntropy" else 1
        return {
            "encoder": self.encoder.init(k1),
            "cls": linear_params(k2, self.cfg.embedding_dim, out),
        }

    def scores(self, params, x, lengths, train=False, rng=None):
        h = self.encoder.apply(params["encoder"], x, lengths, train, rng)
        return linear(params["cls"], h)

    def loss(self, params, x, lengths, tags, rng=None):
        logits = self.scores(params, x, lengths, train=True, rng=rng)
        return head_loss(self.cfg, logits, lengths, tags)

    def decode(self, params, x, lengths, threshold):
        logits = self.scores(params, x, lengths)
        return logits, head_decode(self.cfg, logits, threshold)


class TransformerCRF:
    """Dense transformer encoder + CRF (reference TransformerCRF,
    models/CRF.py:481-506 — built here on the working encoder rather than
    copying the reference's broken kwargs passing, models/CRF.py:491)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg
        self.encoder = _BertStyleEncoder(
            cfg.embedding_dim, cfg.nheads, cfg.num_layers, cfg.hidden_dim,
            None, cfg.dropout_in,
        )

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "encoder": self.encoder.init(k1),
            "crf": crf_lib.crf_params(k2, self.cfg.embedding_dim, self.cfg.tagset_size),
        }

    def loss(self, params, x, lengths, tags, rng=None):
        mask = length_mask(lengths, x.shape[1], x.dtype)
        h = self.encoder.apply(params["encoder"], x, lengths, train=True, rng=rng)
        return crf_lib.crf_loss(params["crf"], h, jnp.maximum(tags.astype(jnp.int32), 0), mask)

    def decode(self, params, x, lengths, threshold=None):
        mask = length_mask(lengths, x.shape[1], x.dtype)
        h = self.encoder.apply(params["encoder"], x, lengths)
        score, paths = crf_lib.viterbi_decode(params["crf"], h, mask)
        return score, paths.astype(bool)


class _RecurrentLongBlockBase:
    """LSTM -> local-attention block shared by the two hybrid taggers."""

    def _lstm_params(self, rng, in_dim, hidden):
        kf, kb = jax.random.split(rng)
        return {"fwd": lstm_params(kf, in_dim, hidden), "bwd": lstm_params(kb, in_dim, hidden)}


class RecurrentLongT5(_RecurrentLongBlockBase):
    """Stacked [BiLSTM -> LongT5 local-attention block] x num_layers
    (reference RecurrentLongT5, models/CRF.py:613-762)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg
        w = cfg.attention_window
        self.t5 = [
            LongT5Encoder(cfg.hidden_dim * 2, cfg.nheads, 1, cfg.hidden_dim * 2, w,
                          cfg.dropout_in, remat_share=cfg.num_layers)
            for _ in range(cfg.num_layers)
        ]

    def init(self, rng):
        blocks = []
        in_dim = self.cfg.embedding_dim
        for i in range(self.cfg.num_layers):
            rng, k1, k2 = jax.random.split(rng, 3)
            blocks.append(
                {"lstm": self._lstm_params(k1, in_dim, self.cfg.hidden_dim),
                 "t5": self.t5[i].init(k2)}
            )
            in_dim = self.cfg.hidden_dim * 2
        rng, k = jax.random.split(rng)
        out = self.cfg.tagset_size if self.cfg.loss_fn == "CrossEntropy" else 1
        return {"blocks": blocks, "cls": linear_params(k, self.cfg.hidden_dim * 2, out)}

    def scores(self, params, x, lengths, train=False, rng=None):
        # each block's LSTM sits inside the reference's RNN wrapper, which
        # applies dropout_in to its input and dropout_out to its output
        # (CRF.py:620-622 -> NeuralArchitectures.py:89-117). Train-only
        # here: the wrapper's F.dropout(...) omits training= and so also
        # fires at eval — a reference defect this framework does not copy
        # (same policy as the BiLSTM family, taggers.rnn_stack_apply).
        h = x
        for i, bp in enumerate(params["blocks"]):
            if rng is not None:
                rng, k_in, k_out, k = jax.random.split(rng, 4)
            else:
                k_in = k_out = k = None
            h = dropout(h, self.cfg.dropout_in, k_in, not train)
            h = bidirectional_rnn(bp["lstm"]["fwd"], bp["lstm"]["bwd"], h, lengths)
            h = dropout(h, self.cfg.dropout_out, k_out, not train)
            h = self.t5[i].apply(bp["t5"], h, lengths, train, k)
        return linear(params["cls"], h)

    def loss(self, params, x, lengths, tags, rng=None):
        logits = self.scores(params, x, lengths, train=True, rng=rng)
        return head_loss(self.cfg, logits, lengths, tags)

    def decode(self, params, x, lengths, threshold):
        logits = self.scores(params, x, lengths)
        return logits, head_decode(self.cfg, logits, threshold)


class RecurrentLongformer(_RecurrentLongBlockBase):
    """Stacked [BiLSTM -> bare local-MHA block] with the separate
    forward/backward trick, topped by a final BiLSTM (reference
    RecurrentLongformer, models/CRF.py:636-858; the reference asserts a
    fixed 3600-unit budget, here any static length works).

    Block semantics recovered from the vendored longformer_noffn BYTECODE
    (the module ships as 3.10 pyc only; decoded by tools/pyc310.py and
    pinned by tests/test_reference_pyc_glue.py):
    - the "noffn" LongformerLayer is attention-ONLY and returns the bare
      merged-head context: no output projection, no residual, no LayerNorm
      (LongformerAttention.forward never calls LongformerSelfOutput, and
      __init__ never constructs it; LongformerLayer has no intermediate/
      output members).
    - with separate_forward_backward, external_input feeds ONLY the key
      projection — queries AND VALUES come from the forward-LSTM half
      (LongformerSelfAttention.forward: `value_vectors =
      self.value(hidden_states)` unconditionally).
    - scores are scaled by 1/sqrt(head_dim) (HF convention; scale=True).
    - the reference never passes attention_probs_dropout_prob, so the noffn
      block trains with HF's config-default attention-probs dropout p=0.1 —
      replicated here (train-only; the dropped flash pair carries it on
      TPU, the banded XLA path elsewhere; decode/eval is exact either
      way)."""

    NOFFN_ATTN_DROP = 0.1  # HF LongformerConfig default, never overridden

    def __init__(self, cfg: TaggerConfig, separate_forward_backward: bool = True,
                 last_bilstm: bool = True):
        self.cfg = cfg
        self.sep_fb = separate_forward_backward
        self.last_bilstm = last_bilstm
        w = cfg.attention_window
        self.window = w if w % 2 == 0 else w + 1

    def init(self, rng):
        H = self.cfg.hidden_dim
        attn_dim = H if self.sep_fb else 2 * H
        blocks = []
        in_dim = self.cfg.embedding_dim
        for i in range(self.cfg.num_layers):
            rng, k1, k2 = jax.random.split(rng, 3)
            ks = jax.random.split(k2, 3)
            blocks.append(
                {
                    "lstm": self._lstm_params(k1, in_dim, H),
                    "attn": {
                        "q": linear_params(ks[0], attn_dim, attn_dim),
                        "k": linear_params(ks[1], attn_dim, attn_dim),
                        "v": linear_params(ks[2], attn_dim, attn_dim),
                    },
                }
            )
            in_dim = attn_dim
        params = {"blocks": blocks}
        out_dim = attn_dim
        if self.last_bilstm:
            rng, k = jax.random.split(rng)
            params["final_lstm"] = self._lstm_params(k, out_dim, H)
            out_dim = 2 * H
        rng, k = jax.random.split(rng)
        out = self.cfg.tagset_size if self.cfg.loss_fn == "CrossEntropy" else 1
        params["cls"] = linear_params(k, out_dim, out)
        return params

    def scores(self, params, x, lengths, train=False, rng=None):
        H = self.cfg.hidden_dim
        nh = self.cfg.nheads
        mask = length_mask(lengths, x.shape[1], x.dtype)
        h = x
        for bp in params["blocks"]:
            # RNN-wrapper dropouts (CRF.py:644-646: dropout_in on the LSTM
            # input, dropout_out — passed as "dropout_attention" — on its
            # output). Train-only; see RecurrentLongT5.scores for why the
            # reference's eval-time F.dropout leak is not copied.
            if rng is not None:
                rng, k_in, k_out, k_attn = jax.random.split(rng, 4)
                h = dropout(h, self.cfg.dropout_in, k_in, not train)
            else:
                k_attn = None
            h = bidirectional_rnn(bp["lstm"]["fwd"], bp["lstm"]["bwd"], h, lengths)
            if rng is not None:
                h = dropout(h, self.cfg.dropout_out, k_out, not train)
            if self.sep_fb:
                # forward states carry queries AND values; backward states
                # feed only the keys (pyc receipt: key = key(external_input),
                # value = value(hidden_states))
                B, L, _ = h.shape
                hr = h.reshape(B, L, 2, H)
                q_src, k_src = hr[:, :, 0], hr[:, :, 1]
                v_src = q_src
            else:
                q_src = k_src = v_src = h
            q = split_heads(linear(bp["attn"]["q"], q_src), nh)
            k = split_heads(linear(bp["attn"]["k"], k_src), nh)
            v = split_heads(linear(bp["attn"]["v"], v_src), nh)
            # bare context out — the noffn layer has no o-proj/residual/LN
            h = merge_heads(local_attention(
                q, k, v, self.window, mask,
                probs_drop=self.NOFFN_ATTN_DROP if train else 0.0,
                rng=k_attn if train else None,
            ))
        if self.last_bilstm:
            # the trailing RNN wrapper carries the same dropout pair
            # (CRF.py:786-788)
            if rng is not None:
                rng, k_in, k_out = jax.random.split(rng, 3)
                h = dropout(h, self.cfg.dropout_in, k_in, not train)
            h = bidirectional_rnn(
                params["final_lstm"]["fwd"], params["final_lstm"]["bwd"], h, lengths
            )
            if rng is not None:
                h = dropout(h, self.cfg.dropout_out, k_out, not train)
        return linear(params["cls"], h)

    def loss(self, params, x, lengths, tags, rng=None):
        logits = self.scores(params, x, lengths, train=True, rng=rng)
        return head_loss(self.cfg, logits, lengths, tags)

    def decode(self, params, x, lengths, threshold):
        logits = self.scores(params, x, lengths)
        return logits, head_decode(self.cfg, logits, threshold)
