"""Pipeline parallelism (GPipe-style microbatching) for the transformer stack.

The reference has no model parallelism of any kind (SURVEY.md §2.2); this is
one of the framework's TPU-native scaling layers, alongside data/tensor
parallelism (parallel/train_step.py) and sequence parallelism
(parallel/sequence.py). Layers of a `_BertStyleEncoder` stack are split into
S contiguous stages laid out over a 'pipe' mesh axis; a batch is split into
M microbatches that flow through the stages on a `lax.scan` clock of
M + S - 1 ticks, with stage-to-stage activation transfer as a single
`lax.ppermute` hop per tick (nearest-neighbor ICI traffic only — the same
pattern a hand-written GPipe schedule produces, but expressed as one
differentiable SPMD program: `jax.grad` through the scan + ppermute runs the
reverse pipeline automatically, so pipelined TRAINING needs no hand-written
backward schedule).

Design notes:
- Per-layer pyramidal attention windows (models/CRF.py:529) are static
  shapes, so stages would otherwise need different programs; each tick runs
  `lax.switch` over the stage index with one branch per stage, giving every
  stage its own statically-windowed layers inside one SPMD program.
- The microbatch's padding mask travels through the pipeline alongside the
  activations (one extra tiny ppermute), so variable-length documents work.
- Warm-up/drain ticks compute on zero activations with an all-ones mask
  (never an all-masked softmax -> no NaNs to leak into the backward pass);
  their outputs are sliced away.
- Bubble fraction is (S-1)/(M+S-1): callers pick n_micro >= S for >50%
  pipeline utilization, higher for better.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


from . import shard_map as _shard_map

def make_pipeline_mesh(n_devices=None, devices=None) -> Mesh:
    """1-axis ('pipe',) mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, ("pipe",))


def _stack_layers(layer_params: list):
    """List of per-layer pytrees -> one pytree with a leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def pipeline_encoder_apply(
    mesh: Mesh,
    encoder,
    enc_params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    n_micro: int,
    axis: str = "pipe",
    rng=None,
    train: bool = False,
    remat: bool = True,
) -> jnp.ndarray:
    """[B, L, D] -> [B, L, D] through the layer stack, pipelined over
    mesh.shape[axis] stages. B must divide by n_micro and the layer count by
    the stage count. Differentiable end to end.
    """
    from ..models.transformers import bert_layer_apply, layer_norm

    S = mesh.shape[axis]
    B, L, D = x.shape
    nl = encoder.n_layers
    assert nl % S == 0, f"{nl} layers do not split over {S} stages"
    assert B % n_micro == 0, f"batch {B} does not split into {n_micro} microbatches"
    K = nl // S
    mb = B // n_micro
    windows = encoder.windows

    from ..ops.masks import length_mask

    # embedding sublayer: per-position, cheap — runs replicated outside the
    # pipeline so stage 0 holds only transformer layers like every stage
    mask = length_mask(lengths, L, x.dtype)
    x = layer_norm(enc_params["ln_emb"], x + enc_params["pos"][:L][None])

    if S == 1:
        for i, lp in enumerate(enc_params["layers"]):
            w = None if windows is None else windows[i]
            k = None if rng is None else jax.random.fold_in(rng, i)
            x = bert_layer_apply(lp, x, encoder.nheads, mask, window=w,
                                 train=train, rng=k, drop=encoder.drop)
        return x

    stacked = _stack_layers(enc_params["layers"])  # [nl, ...]
    xs = x.reshape(n_micro, mb, L, D)
    masks = mask.reshape(n_micro, mb, L)

    def spmd(local, xs, masks):
        # shard_map hands each device its stage's [K, ...] slice of the
        # [n_layers, ...] stacked params directly
        sidx = lax.axis_index(axis)
        T = n_micro + S - 1

        def stage_branch(s):
            def fn(stage_params, h, m, key):
                for k in range(K):
                    lp = jax.tree.map(lambda a: a[k], stage_params)
                    w = None if windows is None else windows[s * K + k]
                    lk = None if key is None else jax.random.fold_in(key, s * K + k)
                    h = bert_layer_apply(lp, h, encoder.nheads, m, window=w,
                                         train=train, rng=lk, drop=encoder.drop)
                return h
            return jax.checkpoint(fn) if remat else fn

        branches = [stage_branch(s) for s in range(S)]
        perm = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            act, msk = carry
            act_in = lax.ppermute(act, axis, perm)
            msk_in = lax.ppermute(msk, axis, perm)
            mi = jnp.clip(t, 0, n_micro - 1)
            first = (sidx == 0)
            h = jnp.where(first, xs[mi], act_in)
            m = jnp.where(first, masks[mi], msk_in)
            # dropout keys derive from the MICROBATCH this stage is
            # processing at tick t (= t - stage index), not the raw tick:
            # with fold_in(rng, t) a microbatch's mask would depend on the
            # stage count and schedule position, so train-mode numerics
            # would differ across pipeline depths (round-2 review item)
            my_mi = jnp.clip(t - sidx, 0, n_micro - 1)
            key = None if rng is None else jax.random.fold_in(rng, my_mi)
            y = lax.switch(sidx, branches, local, h, m, key)
            return (y, m), y

        # the carry is device-varying (each stage holds different values), so
        # the replicated zeros/ones init must be cast to 'varying' explicitly
        init = jax.tree.map(
            lambda a: lax.pcast(a, (axis,), to="varying"),
            (jnp.zeros((mb, L, D), x.dtype), jnp.ones((mb, L), x.dtype)),
        )
        _, ys = lax.scan(tick, init, jnp.arange(T))
        # microbatch m's final output leaves the last stage at tick m + S - 1
        out = lax.dynamic_slice_in_dim(ys, S - 1, n_micro, axis=0)
        return out[None]  # [1, M, mb, L, D]; only stage S-1's slice is real

    fn = _shard_map()(
        spmd,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(axis),
    )
    out = fn(stacked, xs, masks)  # [S, M, mb, L, D]
    return out[S - 1].reshape(B, L, D)


def pipeline_transformer_scores(
    mesh: Mesh,
    segmenter,
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    n_micro: int,
    axis: str = "pipe",
    rng=None,
    train: bool = False,
) -> jnp.ndarray:
    """TransformerSegmenter.scores with the encoder pipelined over `axis`."""
    from ..models.base import linear

    h = pipeline_encoder_apply(
        mesh, segmenter.encoder, params["encoder"], x, lengths, n_micro,
        axis=axis, rng=rng, train=train,
    )
    return linear(params["cls"], h)


def pipeline_transformer_loss(
    mesh: Mesh,
    segmenter,
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    tags: jnp.ndarray,
    n_micro: int,
    axis: str = "pipe",
    rng=None,
) -> jnp.ndarray:
    """Training loss through the pipelined encoder (jit/grad this whole
    function; the backward pass runs the reverse pipeline schedule)."""
    from ..models.base import head_loss

    logits = pipeline_transformer_scores(
        mesh, segmenter, params, x, lengths, n_micro,
        axis=axis, rng=rng, train=True,
    )
    return head_loss(segmenter.cfg, logits, lengths, tags)
