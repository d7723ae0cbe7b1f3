"""Attention ops: dense MHA and blocked sliding-window (local) attention.

The reference gets sliding-window attention from HF Longformer's chunked
CUDA path (models/longformer_noffn pyc: `_sliding_chunks_query_key_matmul`)
after abandoning a per-position Python loop for being too slow
(/root/reference/models/RestrictedTransformerLayer.py:192,509-636).

TPU design: the 3-block banded scheme — queries chunked into blocks of
`w/2`; each query block attends keys/values of its own + adjacent blocks,
masked to |i-j| <= w/2. Two implementations:

- XLA blocked path (below): batched matmuls on the MXU with a static band
  mask; XLA fuses the softmax. Used on CPU and under MTS_FLASH_ATTENTION=0.
- flash Pallas fwd+bwd pairs (pallas_attention.flash_local_attention and
  .flash_local_attention_biased): keep every score tile in VMEM with a
  streaming softmax and a custom_vjp backward that recomputes tiles
  blockwise. `use_pallas="auto"` picks them on TPU: the unbiased pair for
  Longformer-family calls (scaled, no bias — measured 77.9 -> 67.8 ms on
  the flagship 10x3600 train step at identical loss) and the biased pair
  for T5-family calls (translation-invariant relative bias, unscaled —
  makes the 10x3600 RecurrentLongT5 step FIT, where the XLA path's 4.15 GB
  banded score tensor crashes the worker). The older forward-only kernel
  (pallas_local_attention) remains an explicit `use_pallas=True` opt-in.

Also here: T5-style relative position bucketing for the LongT5-style
local attention (RestrictedTransformerLayer.py:147-159).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

NEG_INF = -1e9


def _flash_default() -> bool:
    """Whether `use_pallas="auto"` picks the flash Pallas pair on TPU.
    Default ON: the flagship 10x3600 long-document train step measured
    77.9 ms (XLA blocked path) vs 67.8 ms (flash), identical loss, best of
    3x20-step trials (docs/PERFORMANCE.md). MTS_FLASH_ATTENTION=0 opts out."""
    import os

    return os.environ.get("MTS_FLASH_ATTENTION", "1") == "1"


def flash_attention_active() -> bool:
    """True when local_attention's auto dispatch will take a flash Pallas
    pair for the library's configurations (scaled Longformer-family or
    biased T5-family calls, static dropout rates) — i.e. TPU backend and
    MTS_FLASH_ATTENTION not disabled. Trace-time policy code (the
    transformer families' auto-remat) uses this to know whether active
    attention-probs dropout will still avoid the banded score tensors."""
    return _flash_default() and jax.devices()[0].platform == "tpu"


def _drop_probs(w, rate, rng):
    """Attention-probs dropout, HF semantics: zero softmaxed weights and
    rescale survivors by 1/keep (BertSelfAttention/T5Attention both drop the
    POST-softmax probabilities). Inactive when rng is None (eval) or the
    rate is a static zero."""
    if rng is None or (not isinstance(rate, jnp.ndarray) and rate == 0.0):
        return w
    keep = 1.0 - rate
    m = jax.random.bernoulli(rng, keep, w.shape)
    return jnp.where(m, w / keep, 0.0)


def dense_attention(q, k, v, mask=None, bias=None, probs_drop=0.0, rng=None):
    """Reference MHA core. q,k,v: [B, H, L, Dh]; mask: [B, L] (1=valid);
    bias: broadcastable to [B, H, Lq, Lk]; probs_drop/rng: train-time
    attention-probs dropout (see _drop_probs)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = scores + (1.0 - mask[:, None, None, :]) * NEG_INF
    w = _drop_probs(jax.nn.softmax(scores, axis=-1), probs_drop, rng)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _band_mask(block: int, half: int, dtype=jnp.float32) -> jnp.ndarray:
    """[block, 3*block] additive mask allowing |global offset| <= half."""
    qpos = np.arange(block)[:, None]
    kpos = np.arange(3 * block)[None, :] - block
    ok = np.abs(kpos - qpos) <= half
    return jnp.asarray(np.where(ok, 0.0, NEG_INF), dtype)


def local_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    mask: jnp.ndarray = None,
    bias_fn=None,
    use_pallas: str = "auto",
    scale: bool = True,
    probs_drop=0.0,
    rng=None,
):
    """Sliding-window attention. q,k,v: [B, H, L, Dh]; window = total span
    (w/2 on each side, HF Longformer convention, must be even).

    bias_fn: optional fn(rel_offsets [block, 3*block]) -> [H, block, 3*block]
    additive bias (used for T5 relative-position buckets).
    scale: divide scores by sqrt(Dh) (Longformer/BERT convention); T5-family
    attention does NOT scale (HF T5Attention folds it into init), so the
    LongT5 path passes scale=False for exact HF parity.
    Returns [B, H, L, Dh].

    use_pallas: "auto" (default) picks a flash streaming-softmax Pallas
    pair on TPU — the unbiased pair for Longformer-shaped calls (scaled,
    bias-free) and the biased pair when bias_fn is given (T5 family; the
    relative bias is translation-invariant, so one [H, block, 3*block]
    tile serves every query block and its gradient flows back into the
    bucket table). Active probs_drop rides the *_dropped flash variants
    (same bernoulli draw as the XLA path, regenerated from the key in
    backward) unless the rate is a traced array. Masks must be PREFIX
    masks — every library caller's are, from length_mask. "flash" forces
    the flash route, False forces XLA, True forces the older forward-only
    fused kernel (inference only: pallas_call has no reverse-mode
    autodiff). Measured history: round 3
    rebuilt the XLA path's 3-block K/V neighborhood from shifted slices
    instead of a 3x-duplicating gather (the gather's scatter-add backward
    cost 25% of the flagship 10x3600 train step, 105.6 -> 79.3 ms); round
    4's flash pairs cut the same step 77.9 -> 67.8 ms and made the
    10x3600 RecurrentLongT5 step fit in HBM at all (XLA path: worker
    crash; flash: 117.7 ms/step).
    """
    assert window % 2 == 0, "attention window must be even"
    B, H, L, Dh = q.shape
    half = window // 2
    block = max(half, 1)
    drop_active = rng is not None and (
        isinstance(probs_drop, jnp.ndarray) or probs_drop > 0.0
    )

    if use_pallas == "auto":
        # the flash (streaming-softmax) Pallas pair avoids materializing the
        # [B,H,nb,block,3b] score tensor in HBM in BOTH directions. On TPU,
        # auto engages the unbiased pair for the Longformer-family
        # configuration (scaled scores, no bias, prefix masks) and the
        # biased pair for the T5 family (translation-invariant additive
        # relative bias, unscaled) — both measured on the flagship configs
        # (docs/PERFORMANCE.md).
        on_tpu = jax.devices()[0].platform == "tpu"
        # flash covers every library configuration except the (unused)
        # unbiased-AND-unscaled combination, which only the XLA path takes.
        # ACTIVE attention-probs dropout routes to the dropped flash
        # variants: the 0/1 mask is the same bernoulli draw as this file's
        # _drop_probs (bit-identical when the block geometries coincide),
        # generated outside the kernel and regenerated from the key in the
        # backward (pallas_attention._drop_mask)
        flash_ok = bias_fn is not None or scale
        # a TRACED dropout rate can't be a static custom_vjp argument — only
        # the XLA path serves it (no library caller passes one; the vmapped
        # grid trainer varies LAYER dropout, not attention-probs dropout)
        static_rate = not isinstance(probs_drop, jnp.ndarray)
        use_pallas = (
            "flash"
            if _flash_default() and on_tpu and flash_ok
            and (static_rate or not drop_active)
            else False
        )
    if use_pallas == "flash":
        if mask is None:
            mask = jnp.ones((B, L), q.dtype)
        rate = float(probs_drop) if drop_active else 0.0
        if bias_fn is None:
            assert scale, "unbiased flash local attention is always scaled"
            from .pallas_attention import (
                flash_local_attention,
                flash_local_attention_dropped,
            )

            if drop_active:
                return flash_local_attention_dropped(q, k, v, mask, rng,
                                                     window, rate)
            return flash_local_attention(q, k, v, mask, window)
        # biased pair: the T5 relative bias depends only on the offset, so
        # one [H, block, 3*block] tile (built with the FLASH block geometry,
        # which may differ from the XLA path's) serves every query block and
        # stays differentiable through bias_fn into the bucket table
        from .pallas_attention import (
            _flash_geometry,
            flash_local_attention_biased,
            flash_local_attention_biased_dropped,
        )

        fblock = _flash_geometry(L, half)[0]
        rel = jnp.asarray(
            np.arange(3 * fblock)[None, :] - fblock - np.arange(fblock)[:, None]
        )
        if drop_active:
            return flash_local_attention_biased_dropped(
                q, k, v, mask, bias_fn(rel), rng, window, rate, scale
            )
        return flash_local_attention_biased(
            q, k, v, mask, bias_fn(rel), window, scale
        )
    if use_pallas is True:
        # the fused kernel supports neither additive score biases (T5
        # relative positions) nor non-prefix masks — silently dropping
        # either would change logits vs the XLA path used in training
        assert bias_fn is None, "pallas local attention does not support bias_fn"
        assert not drop_active, "pallas local attention has no probs dropout"
        # the kernel scales unconditionally by 1/sqrt(Dh); serving an
        # unscaled (T5-convention) call would silently change logits
        assert scale, "pallas local attention always scales by 1/sqrt(Dh)"
        from .pallas_attention import pallas_local_attention

        return pallas_local_attention(q, k, v, window, mask)

    nb = -(-L // block)
    pad = nb * block - L
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if mask is None:
        mask = jnp.ones((B, L), q.dtype)
    mp = jnp.pad(mask, ((0, 0), (0, pad)))

    # key/value blocks with one-block halo on each side. Each query block j
    # sees key blocks j-1/j/j+1; instead of GATHERING a 3x-duplicated
    # [B,H,nb,3b,Dh] key tensor (measured ~3.3 GB per K and per V at the
    # 10x3600 w=240 flagship — the dominant HBM traffic of the long-doc
    # step), take three SHIFTED reshapes of the one padded buffer: XLA reads
    # each slice in place, cutting the materialized traffic ~3x with
    # bit-identical scores.
    kp = jnp.pad(kp, ((0, 0), (0, 0), (block, block), (0, 0)))
    vp = jnp.pad(vp, ((0, 0), (0, 0), (block, block), (0, 0)))
    mp_k = jnp.pad(mp, ((0, 0), (block, block)))

    qb = qp.reshape(B, H, nb, block, Dh)

    def shifted(x, s):
        # [B, H, nb*b + 2b, Dh] -> [B, H, nb, b, Dh], row j = block j-1+s/b
        return lax.dynamic_slice_in_dim(x, s * block, nb * block, axis=2).reshape(
            B, H, nb, block, Dh
        )

    def mask_shifted(s):
        return lax.dynamic_slice_in_dim(mp_k, s * block, nb * block, axis=1).reshape(
            B, nb, block
        )

    band = _band_mask(block, half, q.dtype)  # [block, 3b]
    if bias_fn is not None:
        rel = np.arange(3 * block)[None, :] - block - np.arange(block)[:, None]
        bias = bias_fn(jnp.asarray(rel))  # [H, block, 3b]

    score_parts = []
    for s in range(3):
        part = jnp.einsum("bhnqd,bhnkd->bhnqk", qb, shifted(kp, s))
        if scale:
            part = part / math.sqrt(Dh)
        part = part + band[None, None, None, :, s * block : (s + 1) * block]
        if bias_fn is not None:
            part = part + bias[None, :, None, :, s * block : (s + 1) * block]
        part = part + (1.0 - mask_shifted(s)[:, None, :, None, :]) * NEG_INF
        score_parts.append(part)

    scores = jnp.concatenate(score_parts, axis=-1)  # [B, H, nb, block, 3b]
    w = _drop_probs(jax.nn.softmax(scores, axis=-1), probs_drop, rng)
    # rows fully masked (padding queries) produce uniform weights; harmless
    out = sum(
        jnp.einsum("bhnqk,bhnkd->bhnqd", w[..., s * block : (s + 1) * block],
                   shifted(vp, s))
        for s in range(3)
    )
    out = out.reshape(B, H, nb * block, Dh)[:, :, :L]
    return out


# ---------------------------------------------------------------------------
# T5 relative position buckets (for LongT5-style local attention)
# ---------------------------------------------------------------------------


def t5_relative_bucket(relative_position, num_buckets: int, max_distance: int):
    """Bidirectional T5 bucketing (same math as HF T5Attention._relative_position_bucket)."""
    rp = relative_position
    num_buckets //= 2
    ret = jnp.where(rp > 0, num_buckets, 0)
    rp = jnp.abs(rp)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    # clamp INSIDE the discarded is_small branch only (rp < max_exact, incl.
    # rp=0 where a bare log is -inf); for the selected branch the argument
    # is exactly HF's log(rp/max_exact) — an additive epsilon would shift
    # truncation by ~5e-6 buckets and can flip a bucket at the boundary
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(rp, max_exact).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, rp, val_if_large)


def relative_bias_fn(bias_table: jnp.ndarray, num_buckets: int, max_distance: int):
    """bias_table: [num_buckets, H] -> fn(rel [q,k]) -> [H, q, k]."""

    def fn(rel):
        buckets = t5_relative_bucket(rel, num_buckets, max_distance)
        return jnp.transpose(bias_table[buckets], (2, 0, 1))

    return fn


def split_heads(x: jnp.ndarray, nheads: int) -> jnp.ndarray:
    B, L, D = x.shape
    return jnp.transpose(x.reshape(B, L, nheads, D // nheads), (0, 2, 1, 3))


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, H, L, Dh = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, L, H * Dh)
