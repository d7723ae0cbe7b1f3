"""Auxiliary segment-coherence cosine loss.

Reference semantics (/root/reference/models/CRF.py:23-92, weighted 0.1 at
:335,440,1190): for every complete topic segment, the sum of even-indexed
unit embeddings should be cosine-similar to the sum of odd-indexed ones
(positive pair); sums of consecutive segments should be dissimilar
(negative pair, CosineEmbeddingLoss target -1, margin 0).

The reference path is broken as shipped — it reads `batch['src_segments']`
which the collater never produces (lightning_model.py:277-279 vs
EncoderDataset.py:145-152) — so this implementation derives the segment
structure from the boundary labels on device: segment ids are a prefix sum
of boundaries, and all pair sums are masked segment reductions with static
shapes (no host loops).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _cos(a, b, eps=1e-8):
    na = jnp.sqrt(jnp.sum(a * a, axis=-1) + eps)
    nb = jnp.sqrt(jnp.sum(b * b, axis=-1) + eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def cosine_segment_loss(
    h: jnp.ndarray,  # [B, L, D] encoder states
    lengths: jnp.ndarray,  # [B]
    tags: jnp.ndarray,  # [B, L] 0/1 boundary labels (1 = last unit of segment)
) -> jnp.ndarray:
    B, L, D = h.shape
    valid = (jnp.arange(L)[None, :] < lengths[:, None])
    t = jnp.where(valid, jnp.maximum(tags, 0.0), 0.0)

    # segment id per unit: number of boundaries strictly before the unit
    seg_id = jnp.cumsum(t, axis=1) - t  # boundary unit keeps its own segment
    seg_id = seg_id.astype(jnp.int32)
    n_bound = jnp.sum(t, axis=1).astype(jnp.int32)  # complete segments per doc

    def per_doc(hb, seg, tb, vb, nb):
        # position within segment (for even/odd split)
        idx = jnp.arange(L)
        seg_start = jax.ops.segment_min(jnp.where(vb, idx, L), seg, L)
        pos_in_seg = idx - seg_start[seg]
        even = (pos_in_seg % 2 == 0) & vb
        odd = (pos_in_seg % 2 == 1) & vb

        w = vb.astype(hb.dtype)[:, None]
        sum_even = jax.ops.segment_sum(hb * (even.astype(hb.dtype))[:, None], seg, L)
        sum_odd = jax.ops.segment_sum(hb * (odd.astype(hb.dtype))[:, None], seg, L)
        seg_sum = jax.ops.segment_sum(hb * w, seg, L)
        seg_len = jax.ops.segment_sum(vb.astype(hb.dtype), seg, L)

        s = jnp.arange(L)
        complete = s < nb  # segments ending at a boundary
        # positives: even/odd halves of complete segments with > 1 unit
        pos_valid = complete & (seg_len > 1)
        pos_loss = 1.0 - _cos(sum_even, sum_odd)
        # negatives: consecutive (segment, next region) pairs
        nxt = jnp.minimum(s + 1, L - 1)
        neg_valid = complete & (seg_len[nxt] > 0)
        neg_loss = jnp.maximum(_cos(seg_sum, seg_sum[nxt]), 0.0)

        total = (
            jnp.sum(jnp.where(pos_valid, pos_loss, 0.0))
            + jnp.sum(jnp.where(neg_valid, neg_loss, 0.0))
        )
        count = jnp.sum(pos_valid) + jnp.sum(neg_valid)
        return total, count

    totals, counts = jax.vmap(per_doc)(h, seg_id, t, valid, n_bound)
    return jnp.sum(totals) / jnp.maximum(jnp.sum(counts), 1.0)
