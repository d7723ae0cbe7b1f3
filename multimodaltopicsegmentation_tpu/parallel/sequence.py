"""Sequence (context) parallelism for local attention.

The reference's long-sequence story is windowed attention + truncation to
3600 units (SURVEY.md §5). Because attention is LOCAL, sharding the unit
axis across chips only needs a one-window halo exchange with ring
neighbors — no ring attention / Ulysses machinery:

  each shard holds L/n units; before attending, it receives the last
  `w/2` positions of the left neighbor and the first `w/2` of the right
  neighbor via `lax.ppermute` over the ICI mesh axis, runs the same
  blocked local-attention kernel on [halo | shard | halo], and keeps the
  center slice.

`sequence_sharded_local_attention` is written against a named mesh axis
inside `shard_map`; results are bit-comparable to single-device local
attention (tests run on the 8-virtual-device CPU mesh).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attention import local_attention


def _halo_exchange(x: jnp.ndarray, halo: int, axis_name: str):
    """x: [B, H, Lshard, Dh] -> (left_halo, right_halo) from ring neighbors."""
    n = lax.axis_size(axis_name)
    # send my first `halo` positions to the left neighbor (they become its
    # right halo), and my last `halo` to the right neighbor (its left halo)
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    left_halo = lax.ppermute(x[:, :, -halo:], axis_name, right_perm)
    right_halo = lax.ppermute(x[:, :, :halo], axis_name, left_perm)
    return left_halo, right_halo


def _shard_body(q, k, v, mask, window: int, axis_name: str):
    """Runs inside shard_map: q/k/v [B, H, Lshard, Dh], mask [B, Lshard]."""
    halo = window // 2
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    kl, kr = _halo_exchange(k, halo, axis_name)
    vl, vr = _halo_exchange(v, halo, axis_name)
    ml, mr = _halo_exchange(mask[:, None, :, None].astype(k.dtype), halo, axis_name)
    ml = ml[:, 0, :, 0]
    mr = mr[:, 0, :, 0]

    # edge shards have no real neighbor: mask the wrapped halos out
    ml = jnp.where(idx == 0, 0.0, ml)
    mr = jnp.where(idx == n - 1, 0.0, mr)

    k_ext = jnp.concatenate([kl, k, kr], axis=2)
    v_ext = jnp.concatenate([vl, v, vr], axis=2)
    m_ext = jnp.concatenate([ml, mask, mr], axis=1)
    # queries: only the center slice is real; pad halo-query slots so the
    # blocked kernel sees aligned positions, then slice the center back out
    q_ext = jnp.concatenate([jnp.zeros_like(kl), q, jnp.zeros_like(kr)], axis=2)

    out = local_attention(q_ext, k_ext, v_ext, window, m_ext, use_pallas=False)
    return out[:, :, halo:-halo]


def sequence_sharded_local_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    mask: jnp.ndarray,
    axis: str = "data",
):
    """q,k,v: [B, H, L, Dh] with L divisible by mesh.shape[axis]."""
    from . import shard_map as _sm

    shard_map = _sm()
    spec = P(None, None, axis, None)
    mspec = P(None, axis)
    fn = shard_map(
        partial(_shard_body, window=window, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
    )
    return fn(q, k, v, mask)


def sequence_sharded_transformer_decode(
    mesh: Mesh,
    segmenter,
    params,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    threshold: float,
    axis: str = "data",
):
    """Decode ONE batch of long documents with the UNIT axis sharded over
    the mesh (see sequence_sharded_transformer_scores)."""
    from ..models.base import head_decode

    logits = sequence_sharded_transformer_scores(
        mesh, segmenter, params, x, lengths, axis=axis
    )
    return logits, head_decode(segmenter.cfg, logits, threshold)


def sequence_sharded_transformer_scores(
    mesh: Mesh,
    segmenter,
    params,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    axis: str = "data",
    train: bool = False,
    rng=None,
):
    """Classifier logits with the UNIT axis sharded over the mesh: each
    chip holds L/n units and runs the full transformer stack on its slice;
    the only cross-chip communication is the per-layer one-window halo
    exchange inside local attention (positional embeddings are sliced at
    each shard's global offset). Numerics match the single-device
    `TransformerSegmenter` exactly (valid region).

    x: [B, L, D] with L divisible by mesh.shape[axis]; the pyramidal
    per-layer window must not exceed the shard length (halo = window/2).
    Differentiable (ppermute transposes to the reverse exchange), so
    `sequence_sharded_transformer_loss` trains long documents that exceed
    one chip's HBM. Dropout keys decorrelate per shard via fold_in.
    """
    from . import shard_map as _sm

    shard_map = _sm()
    from ..models.transformers import linear, merge_heads, split_heads

    enc = segmenter.encoder
    n = mesh.shape[axis]
    B, L, D = x.shape
    assert L % n == 0, (L, n)
    max_window = max(enc.windows) if enc.windows else None
    assert max_window is not None, "sequence sharding needs LOCAL attention"
    assert max_window // 2 <= L // n, (
        f"widest window {max_window} exceeds shard length {L // n}"
    )

    def attend(ap, h, m, window):
        q = split_heads(linear(ap["q"], h), enc.nheads)
        k = split_heads(linear(ap["k"], h), enc.nheads)
        v = split_heads(linear(ap["v"], h), enc.nheads)
        out = _shard_body(q, k, v, m, window=window, axis_name=axis)
        return linear(ap["o"], merge_heads(out))

    def run(p, x_sh, lens):
        Ls = x_sh.shape[1]
        start = lax.axis_index(axis) * Ls
        gpos = start + jnp.arange(Ls)
        mask = (gpos[None, :] < lens[:, None]).astype(x_sh.dtype)
        key = None if rng is None else jax.random.fold_in(rng, lax.axis_index(axis))
        h = enc.apply(p["encoder"], x_sh, lens, attend_fn=attend,
                      pos_offset=start, mask=mask, train=train, rng=key)
        return linear(p["cls"], h)

    fn = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P()),
        out_specs=P(None, axis, None),
    )
    return fn(params, x, lengths)


def sequence_sharded_transformer_loss(
    mesh: Mesh,
    segmenter,
    params,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    tags: jnp.ndarray,
    axis: str = "data",
    rng=None,
    train: bool = True,
):
    """Training loss through the sequence-sharded stack (jit/grad the whole
    function; parameter gradients psum over the shards automatically via
    the shard_map transpose of the replicated param inputs). `train=False`
    gives the deterministic (dropout-free) loss for validation monitoring."""
    from ..models.base import head_loss

    logits = sequence_sharded_transformer_scores(
        mesh, segmenter, params, x, lengths, axis=axis, train=train, rng=rng
    )
    return head_loss(segmenter.cfg, logits, lengths, tags)
