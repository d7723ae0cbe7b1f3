"""Fused Pallas TPU kernel for sliding-window (Longformer-style) attention.

Grid: (batch*heads, n_query_blocks). Each program holds one query block in
VMEM plus the three key/value blocks it can see (previous / self / next),
computes the banded scores, softmax, and the weighted sum — one HBM
round-trip for q/k/v instead of the gathered 3x-duplicated key tensor the
pure-XLA path materializes.

Validity is derived inside the kernel from scalar-prefetched sequence
lengths: a key at global position p is attendable iff 0 <= p < length and
|p - q| <= window/2. Clamped edge-neighbor blocks therefore mask themselves
out (their assumed global positions fall outside [0, length)), so no edge
predicates or gathered masks are needed.

Block size is the half-window rounded up to the sublane quantum (8); the
band mask still restricts attention to exactly |i-j| <= window/2. Numerics
match ops.attention.local_attention to 1e-5 (see tests/test_attention.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(len_ref, q_ref, km_ref, ks_ref, kp_ref, vm_ref, vs_ref, vp_ref,
            out_ref, *, half: int, block: int, scale: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[i]
    qbase = j * block

    q = q_ref[0] * scale  # [block, Dh]
    qpos = lax.broadcasted_iota(jnp.int32, (block, block), 0) + qbase

    def scores_for(k_ref, koffset):
        kpos = lax.broadcasted_iota(jnp.int32, (block, block), 1) + qbase + koffset
        ok = (
            (jnp.abs(kpos - qpos) <= half)
            & (kpos >= 0)
            & (kpos < length)
        )
        s = jnp.dot(q, k_ref[0].T, preferred_element_type=jnp.float32)
        return jnp.where(ok, s, NEG_INF)

    s_prev = scores_for(km_ref, -block)
    s_self = scores_for(ks_ref, 0)
    s_next = scores_for(kp_ref, block)

    s = jnp.concatenate([s_prev, s_self, s_next], axis=-1)  # [block, 3*block]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)

    wm, ws, wp = w[:, :block], w[:, block : 2 * block], w[:, 2 * block :]
    out = (
        jnp.dot(wm, vm_ref[0], preferred_element_type=jnp.float32)
        + jnp.dot(ws, vs_ref[0], preferred_element_type=jnp.float32)
        + jnp.dot(wp, vp_ref[0], preferred_element_type=jnp.float32)
    )
    out_ref[0] = out.astype(out_ref.dtype)


def pallas_local_attention(q, k, v, window: int, mask=None, interpret: bool = False):
    """q,k,v: [B, H, L, Dh]; window even; mask: [B, L] length mask (1=valid,
    must be a prefix mask — position masks derive from per-row lengths)."""
    assert window % 2 == 0
    B, H, L, Dh = q.shape
    half = window // 2
    # sublane quantum: Mosaic wants the second-to-last block dim % 8 == 0
    block = max(-(-half // 8) * 8, 8)
    nb = -(-L // block)
    pad = nb * block - L

    if mask is None:
        lengths = jnp.full((B,), L, jnp.int32)
    else:
        lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
    lengths = jnp.repeat(lengths, H)  # [B*H]

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x.reshape(B * H, nb * block, Dh)

    qf, kf, vf = prep(q), prep(k), prep(v)

    def idx(fn):
        # leading scalar-prefetch ref is passed to index maps as first arg
        return lambda i, j, lens: (i, fn(j), 0)

    prev = lambda j: jnp.maximum(j - 1, 0)
    self_ = lambda j: j
    nxt = lambda j: jnp.minimum(j + 1, nb - 1)

    kv_spec = lambda fn: pl.BlockSpec((1, block, Dh), idx(fn))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nb),
        in_specs=[
            kv_spec(self_),  # q
            kv_spec(prev), kv_spec(self_), kv_spec(nxt),  # k
            kv_spec(prev), kv_spec(self_), kv_spec(nxt),  # v
        ],
        out_specs=kv_spec(self_),
    )

    out = pl.pallas_call(
        functools.partial(_kernel, half=half, block=block, scale=1.0 / math.sqrt(Dh)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, nb * block, Dh), q.dtype),
        interpret=interpret,
    )(lengths, qf, kf, kf, kf, vf, vf, vf)

    return out.reshape(B, H, nb * block, Dh)[:, :, :L]
