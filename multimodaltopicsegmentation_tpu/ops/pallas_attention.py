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


def _mask_cotangent(mask):
    """Zero cotangent for the (non-differentiable) mask primal. Bool/int
    masks take a float0 cotangent — returning zeros of the primal dtype
    raises a TypeError at grad time, a failure only the TPU flash default
    would hit (the XLA path accepts non-float masks under grad fine)."""
    if jnp.issubdtype(mask.dtype, jnp.inexact):
        return jnp.zeros_like(mask)
    import numpy as np

    return np.zeros(mask.shape, dtype=jax.dtypes.float0)


def _flash_bf16() -> bool:
    # MTS_FLASH_BF16=1 runs the flash kernels' matmuls with bf16 operands
    # (f32 accumulation) — the same effective precision as the XLA path's
    # DEFAULT TPU matmuls. Off by default: a clean A/B at the flagship
    # 10x3600 train step measured bf16 ~3% SLOWER (69.6 vs 67.6 ms, tight
    # across trials) — the kernels are bandwidth/VPU-bound, not MXU-bound,
    # so the casts only add VPU work. Kept as an opt-in for future shapes
    # where the MXU dominates; exact-f32 parity with the CPU reference is
    # the default.
    import os

    return os.environ.get("MTS_FLASH_BF16", "0") == "1"


def _dot(a, b, bf16: bool):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


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


# ---------------------------------------------------------------------------
# Flash (streaming-softmax) local attention with a custom backward pair.
#
# The XLA training path materializes the banded score tensor
# [B, H, nb, block, 3*block] in HBM once in forward and several more times in
# the rematerialized backward (softmax weights, dW, dscores) — measured as the
# dominant HBM traffic of the flagship long-document train step. These kernels
# keep every score tile in VMEM: forward emits only the output and the per-row
# logsumexp; backward recomputes score tiles blockwise (one kernel over query
# blocks for dq, one over key blocks for dk/dv) so nothing score-shaped ever
# touches HBM. Same banded semantics as the reference's Longformer chunked
# attention (/root/reference/models/RestrictedTransformerLayer.py:509-636).
#
# Scope (mirrors pallas_local_attention): scaled scores, no bias_fn, masks
# are PREFIX masks (per-row lengths). Padded-query rows get ZERO gradient
# here; XLA autodiff backpropagates their uniform softmax weights instead,
# which only differs when the upstream cotangent is nonzero at padded
# positions — impossible through the library's length-masked losses.
# ---------------------------------------------------------------------------



def _flash_fwd_kernel(len_ref, q_ref, km_ref, ks_ref, kp_ref, vm_ref, vs_ref,
                      vp_ref, *refs, half: int, block: int, scale: float,
                      bf16: bool, biased: bool = False, keep: float = 1.0):
    """Shared forward kernel; optional refs are threaded in in spec order —
    a bias ref when the caller is the biased (LongT5-family) entry, then a
    dropout-mask ref (0/1 tile, [block, 3*block]) when attention-probs
    dropout is active (keep < 1). The trailing refs are (out, lse)."""
    refs = list(refs)
    bias_ref = refs.pop(0) if biased else None
    drop_ref = refs.pop(0) if keep < 1.0 else None
    out_ref, lse_ref = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[i]
    qbase = j * block

    q = q_ref[0] * scale
    qpos = lax.broadcasted_iota(jnp.int32, (block, block), 0) + qbase

    def scores_for(k_ref, koffset):
        kpos = lax.broadcasted_iota(jnp.int32, (block, block), 1) + qbase + koffset
        ok = (jnp.abs(kpos - qpos) <= half) & (kpos >= 0) & (kpos < length)
        s = _dot(q, k_ref[0].T, bf16)
        return jnp.where(ok, s, NEG_INF)

    s = jnp.concatenate(
        [scores_for(km_ref, -block), scores_for(ks_ref, 0),
         scores_for(kp_ref, block)], axis=-1)
    if bias_ref is not None:
        s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    w = e / l
    if drop_ref is not None:
        # HF attention-probs dropout on the SOFTMAXED weights: the lse/row
        # sums stay undropped (dropout is post-softmax), only the PV
        # accumulation sees the 0/1 mask. (w*m)/keep reproduces the XLA
        # path's where(m, w/keep, 0) bit-for-bit for m in {0,1}.
        w = (w * drop_ref[0]) / keep

    out = (
        _dot(w[:, :block], vm_ref[0], bf16)
        + _dot(w[:, block : 2 * block], vs_ref[0], bf16)
        + _dot(w[:, 2 * block :], vp_ref[0], bf16)
    )
    out_ref[0] = out.astype(out_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


# The dq kernels are the one pair that stays separate: the biased variant
# also produces dbias, which forces an h-major (H, B, nb) grid so each
# head's dbias tile is revisited by CONSECUTIVE grid steps and accumulates
# in VMEM — a different program-id layout, init-once epilogue, and output
# list than the plain 2D dq kernel. Folding them would braid two grid
# geometries through one body for no shared code beyond what scores_for
# already factors.


def _flash_dq_kernel(len_ref, q_ref, km_ref, ks_ref, kp_ref, vm_ref, vs_ref,
                     vp_ref, do_ref, lse_ref, dd_ref, *refs, half: int,
                     block: int, scale: float, bf16: bool, keep: float = 1.0):
    if keep < 1.0:
        drop_ref, dq_ref = refs
    else:
        (dq_ref,), drop_ref = refs, None
    i = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[i]
    qbase = j * block

    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [block, 1]
    dd = dd_ref[0]
    qpos_col = lax.broadcasted_iota(jnp.int32, (block, 1), 0) + qbase
    qvalid = qpos_col < length
    qpos = lax.broadcasted_iota(jnp.int32, (block, block), 0) + qbase

    acc = jnp.zeros((block, q.shape[-1]), jnp.float32)
    for idx, (k_ref, v_ref, koffset) in enumerate(
        ((km_ref, vm_ref, -block), (ks_ref, vs_ref, 0), (kp_ref, vp_ref, block))
    ):
        kpos = lax.broadcasted_iota(jnp.int32, (block, block), 1) + qbase + koffset
        ok = (jnp.abs(kpos - qpos) <= half) & (kpos >= 0) & (kpos < length)
        s = scale * _dot(q, k_ref[0].T, bf16)
        p = jnp.where(ok & qvalid, jnp.exp(s - lse), 0.0)
        dp = _dot(do, v_ref[0].T, bf16)
        if drop_ref is not None:
            # dropout applies to the softmaxed w: dP picks up M/keep; the
            # softmax-jacobian term dd = rowsum(dO*O) is already the dropped
            # sum (O itself was computed with the mask), so ds = p*(dp - dd)
            # is unchanged in form
            dp = (dp * drop_ref[0, :, idx * block : (idx + 1) * block]) / keep
        ds = p * (dp - dd)
        acc = acc + _dot(ds, k_ref[0], bf16)
    dq_ref[0] = (scale * acc).astype(dq_ref.dtype)


def _flash_biased_dq_kernel(len_ref, q_ref, km_ref, ks_ref, kp_ref, vm_ref,
                            vs_ref, vp_ref, bias_ref, do_ref, lse_ref, dd_ref,
                            *refs, half: int, block: int,
                            scale: float, nheads: int, bf16: bool,
                            keep: float = 1.0):
    if keep < 1.0:
        drop_ref, dq_ref, dbias_ref = refs
    else:
        (dq_ref, dbias_ref), drop_ref = refs, None
    h = pl.program_id(0)
    b = pl.program_id(1)
    j = pl.program_id(2)
    length = len_ref[b * nheads + h]
    qbase = j * block

    @pl.when((b == 0) & (j == 0))
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    dd = dd_ref[0]
    qpos_col = lax.broadcasted_iota(jnp.int32, (block, 1), 0) + qbase
    qvalid = qpos_col < length
    qpos = lax.broadcasted_iota(jnp.int32, (block, block), 0) + qbase

    acc = jnp.zeros((block, q.shape[-1]), jnp.float32)
    for idx, (k_ref, v_ref, koffset) in enumerate(
        ((km_ref, vm_ref, -block), (ks_ref, vs_ref, 0), (kp_ref, vp_ref, block))
    ):
        kpos = lax.broadcasted_iota(jnp.int32, (block, block), 1) + qbase + koffset
        ok = (jnp.abs(kpos - qpos) <= half) & (kpos >= 0) & (kpos < length)
        s = scale * _dot(q, k_ref[0].T, bf16)
        s = s + bias_ref[0, :, idx * block : (idx + 1) * block]
        p = jnp.where(ok & qvalid, jnp.exp(s - lse), 0.0)
        dp = _dot(do, v_ref[0].T, bf16)
        if drop_ref is not None:
            dp = (dp * drop_ref[0, :, idx * block : (idx + 1) * block]) / keep
        ds = p * (dp - dd)
        dbias_ref[0, :, idx * block : (idx + 1) * block] += ds
        acc = acc + _dot(ds, k_ref[0], bf16)
    dq_ref[0] = (scale * acc).astype(dq_ref.dtype)


def _flash_dkv_kernel(len_ref, k_ref, v_ref, qm_ref, qs_ref, qp_ref, dom_ref,
                      dos_ref, dop_ref, lsem_ref, lses_ref, lsep_ref, ddm_ref,
                      dds_ref, ddp_ref, *refs, half: int, block: int,
                      scale: float, bf16: bool, biased: bool = False,
                      keep: float = 1.0):
    """Shared dk/dv kernel; optional refs in spec order: three dropout-mask
    tiles for the prev/self/next QUERY blocks when dropout is active
    (keep < 1), then a bias ref on the biased path. Trailing refs are
    (dk, dv)."""
    refs = list(refs)
    if keep < 1.0:
        dropm_ref, drops_ref, dropp_ref = refs[:3]
        refs = refs[3:]
    else:
        dropm_ref = drops_ref = dropp_ref = None
    bias_ref = refs.pop(0) if biased else None
    dk_ref, dv_ref = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[i]
    kbase = j * block

    k = k_ref[0]
    v = v_ref[0]
    kpos_row = lax.broadcasted_iota(jnp.int32, (block, block), 1) + kbase
    dk = jnp.zeros((block, k.shape[-1]), jnp.float32)
    dv = jnp.zeros((block, v.shape[-1]), jnp.float32)
    for q_ref, do_ref, lse_ref, dd_ref, drop_ref, qoffset, slot in (
        (qm_ref, dom_ref, lsem_ref, ddm_ref, dropm_ref, -block, 2),
        (qs_ref, dos_ref, lses_ref, dds_ref, drops_ref, 0, 1),
        (qp_ref, dop_ref, lsep_ref, ddp_ref, dropp_ref, block, 0),
    ):
        q = q_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        dd = dd_ref[0]
        qpos = lax.broadcasted_iota(jnp.int32, (block, block), 0) + kbase + qoffset
        ok = (
            (jnp.abs(kpos_row - qpos) <= half)
            & (kpos_row < length)
            & (qpos >= 0)
            & (qpos < length)
        )
        s = scale * _dot(q, k.T, bf16)
        if bias_ref is not None:
            # this key block sits at neighborhood slot `slot` of the q block
            # at offset `qoffset` (slot = 1 - qoffset/block)
            s = s + bias_ref[0, :, slot * block : (slot + 1) * block]
        p = jnp.where(ok, jnp.exp(s - lse), 0.0)  # [bq, bk]
        if drop_ref is not None:
            # the mask tile belongs to the QUERY block; this key block is
            # its neighborhood slot `slot` (same column slice as the bias)
            pm = drop_ref[0, :, slot * block : (slot + 1) * block]
            dv = dv + _dot(((p * pm) / keep).T, do, bf16)
            dp = (_dot(do, v.T, bf16) * pm) / keep
        else:
            dv = dv + _dot(p.T, do, bf16)
            dp = _dot(do, v.T, bf16)
        ds = p * (dp - dd)
        dk = dk + _dot(ds.T, q, bf16)
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_geometry(L: int, half: int):
    # Query-block quantum: correctness needs only block >= half (the 3-block
    # neighborhood must cover |i-j| <= half) and sublane alignment (%8).
    # MTS_FLASH_BLOCK_QUANT widens the rounding (e.g. 128 to lane-align the
    # [block, 3*block] score tile) — an A/B knob, default 8.
    import os

    quant = int(os.environ.get("MTS_FLASH_BLOCK_QUANT", "8"))
    block = max(-(-half // quant) * quant, 8)
    nb = -(-L // block)
    return block, nb, nb * block - L


def _flash_prep(x, pad, B, H, nb, block, Dh):
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x.reshape(B * H, nb * block, Dh)


def _flash_specs(block: int, nb: int, Dh: int):
    """The (prev, self, next) neighborhood spec builders every flash
    pallas_call shares: blk(fn) tiles [1, block, Dh] rows, stat(fn) the
    [1, block, 1] lse/dd tracks (leading scalar-prefetch ref is passed to
    index maps as first arg)."""
    idx = lambda fn: (lambda i, j, lens: (i, fn(j), 0))
    prev = lambda j: jnp.maximum(j - 1, 0)
    self_ = lambda j: j
    nxt = lambda j: jnp.minimum(j + 1, nb - 1)
    blk = lambda fn: pl.BlockSpec((1, block, Dh), idx(fn))
    stat = lambda fn: pl.BlockSpec((1, block, 1), idx(fn))
    return prev, self_, nxt, blk, stat


def _drop_mask(dropkey, rate: float, B, H, nb, block):
    """0/1 attention-probs dropout mask in the banded flash layout
    [B*H, nb*block, 3*block], drawn EXACTLY like the XLA banded path's
    `_drop_probs` (bernoulli(key, keep) over [B, H, nb, block, 3*block]) —
    when the two paths' block geometries coincide (half % 8 == 0) the same
    key yields bit-identical masks, which is what the parity tests pin.
    Regenerated from the key in the backward, so the custom_vjp residuals
    carry only the key, never the banded-size mask."""
    keep = 1.0 - rate
    m = jax.random.bernoulli(dropkey, keep, (B, H, nb, block, 3 * block))
    return m.reshape(B * H, nb * block, 3 * block).astype(jnp.float32)


def _flash_fwd_impl(q, k, v, mask, window: int, interpret: bool, bias=None,
                    scale: bool = True, dropkey=None, rate: float = 0.0):
    B, H, L, Dh = q.shape
    half = window // 2
    block, nb, pad = _flash_geometry(L, half)
    lengths = jnp.repeat(jnp.sum(mask.astype(jnp.int32), axis=1), H)

    qf = _flash_prep(q, pad, B, H, nb, block, Dh)
    kf = _flash_prep(k, pad, B, H, nb, block, Dh)
    vf = _flash_prep(v, pad, B, H, nb, block, Dh)

    prev, self_, nxt, blk, stat = _flash_specs(block, nb, Dh)
    in_specs = [blk(self_), blk(prev), blk(self_), blk(nxt),
                blk(prev), blk(self_), blk(nxt)]
    operands = [qf, kf, kf, kf, vf, vf, vf]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block, 3 * block),
                                     lambda i, j, lens: (i % H, 0, 0)))
        operands.append(bias.astype(jnp.float32))
    dropped = dropkey is not None and rate > 0.0
    if dropped:
        in_specs.append(pl.BlockSpec((1, block, 3 * block),
                                     lambda i, j, lens: (i, j, 0)))
        operands.append(_drop_mask(dropkey, rate, B, H, nb, block))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nb),
        in_specs=in_specs,
        out_specs=[blk(self_), stat(self_)],
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, half=half, block=block,
                          scale=(1.0 / math.sqrt(Dh)) if scale else 1.0,
                          bf16=_flash_bf16(), biased=bias is not None,
                          keep=(1.0 - rate) if dropped else 1.0),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, nb * block, Dh), q.dtype),
            jax.ShapeDtypeStruct((B * H, nb * block, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lengths, *operands)
    return out.reshape(B, H, nb * block, Dh)[:, :, :L], lse


def _flash_bwd_impl(q, k, v, mask, out, lse, do, window: int, interpret: bool,
                    bias=None, scale: bool = True, dropkey=None,
                    rate: float = 0.0):
    """Returns (dq, dk, dv) — plus dbias when `bias` is given."""
    B, H, L, Dh = q.shape
    half = window // 2
    block, nb, pad = _flash_geometry(L, half)
    lengths = jnp.repeat(jnp.sum(mask.astype(jnp.int32), axis=1), H)

    qf = _flash_prep(q, pad, B, H, nb, block, Dh)
    kf = _flash_prep(k, pad, B, H, nb, block, Dh)
    vf = _flash_prep(v, pad, B, H, nb, block, Dh)
    dof = _flash_prep(do, pad, B, H, nb, block, Dh)
    # D_i = rowsum(dO * O): one cheap fused elementwise pass in XLA
    dd = jnp.pad(jnp.sum(do * out, axis=-1), ((0, 0), (0, 0), (0, pad)))
    dd = dd.reshape(B * H, nb * block, 1).astype(jnp.float32)

    prev, self_, nxt, blk, stat = _flash_specs(block, nb, Dh)
    sc = (1.0 / math.sqrt(Dh)) if scale else 1.0
    dropped = dropkey is not None and rate > 0.0
    keep = (1.0 - rate) if dropped else 1.0
    # regenerated from the key — same draw as the forward pass
    dmf = _drop_mask(dropkey, rate, B, H, nb, block) if dropped else None
    dblk = lambda fn: pl.BlockSpec((1, block, 3 * block),
                                   lambda i, j, lens: (i, fn(j), 0))

    if bias is None:
        dq_in_specs = [blk(self_), blk(prev), blk(self_), blk(nxt),
                       blk(prev), blk(self_), blk(nxt),
                       blk(self_), stat(self_), stat(self_)]
        dq_operands = [qf, kf, kf, kf, vf, vf, vf, dof, lse, dd]
        if dropped:
            dq_in_specs.append(dblk(self_))
            dq_operands.append(dmf)
        dq_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * H, nb),
            in_specs=dq_in_specs,
            out_specs=blk(self_),
        )
        dq = pl.pallas_call(
            functools.partial(_flash_dq_kernel, half=half, block=block,
                              scale=sc, bf16=_flash_bf16(), keep=keep),
            grid_spec=dq_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, nb * block, Dh), q.dtype),
            interpret=interpret,
        )(lengths, *dq_operands)
        dbias = None
    else:
        biasf = bias.astype(jnp.float32)
        # dq + dbias: h-major grid so each head's dbias block is revisited
        # by consecutive steps and accumulates in VMEM (flat row = b * H + h)
        dq_blk = lambda fn: pl.BlockSpec(
            (1, block, Dh), lambda h, b, j, lens: (b * H + h, fn(j), 0))
        dq_stat = lambda fn: pl.BlockSpec(
            (1, block, 1), lambda h, b, j, lens: (b * H + h, fn(j), 0))
        bias_hspec = pl.BlockSpec((1, block, 3 * block),
                                  lambda h, b, j, lens: (h, 0, 0))
        dq_in_specs = [dq_blk(self_), dq_blk(prev), dq_blk(self_), dq_blk(nxt),
                       dq_blk(prev), dq_blk(self_), dq_blk(nxt),
                       bias_hspec,
                       dq_blk(self_), dq_stat(self_), dq_stat(self_)]
        dq_operands = [qf, kf, kf, kf, vf, vf, vf, biasf, dof, lse, dd]
        if dropped:
            dq_in_specs.append(pl.BlockSpec(
                (1, block, 3 * block), lambda h, b, j, lens: (b * H + h, j, 0)))
            dq_operands.append(dmf)
        dq_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, B, nb),
            in_specs=dq_in_specs,
            out_specs=[dq_blk(self_), bias_hspec],
        )
        dq, dbias = pl.pallas_call(
            functools.partial(_flash_biased_dq_kernel, half=half, block=block,
                              scale=sc, nheads=H, bf16=_flash_bf16(),
                              keep=keep),
            grid_spec=dq_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B * H, nb * block, Dh), q.dtype),
                jax.ShapeDtypeStruct((H, block, 3 * block), jnp.float32),
            ],
            interpret=interpret,
        )(lengths, *dq_operands)

    dkv_in_specs = [blk(self_), blk(self_),
                    blk(prev), blk(self_), blk(nxt),
                    blk(prev), blk(self_), blk(nxt),
                    stat(prev), stat(self_), stat(nxt),
                    stat(prev), stat(self_), stat(nxt)]
    dkv_operands = [kf, vf, qf, qf, qf, dof, dof, dof, lse, lse, lse,
                    dd, dd, dd]
    if dropped:
        # the mask tile travels with the QUERY block neighborhood
        dkv_in_specs.extend([dblk(prev), dblk(self_), dblk(nxt)])
        dkv_operands.extend([dmf, dmf, dmf])
    if bias is not None:
        dkv_in_specs.append(pl.BlockSpec((1, block, 3 * block),
                                         lambda i, j, lens: (i % H, 0, 0)))
        dkv_operands.append(bias.astype(jnp.float32))
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nb),
        in_specs=dkv_in_specs,
        out_specs=[blk(self_), blk(self_)],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, half=half, block=block,
                          scale=sc, bf16=_flash_bf16(),
                          biased=bias is not None, keep=keep),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, nb * block, Dh), k.dtype),
            jax.ShapeDtypeStruct((B * H, nb * block, Dh), v.dtype),
        ],
        interpret=interpret,
    )(lengths, *dkv_operands)

    unflat = lambda x: x.reshape(B, H, nb * block, Dh)[:, :, :L]
    if bias is None:
        return unflat(dq), unflat(dk), unflat(dv)
    return unflat(dq), unflat(dk), unflat(dv), dbias.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_local_attention_biased(q, k, v, mask, bias, window: int,
                                 scale: bool = False,
                                 interpret: bool = False):
    """Flash local attention with a translation-invariant additive bias tile.
    q,k,v: [B, H, L, Dh]; mask: [B, L] PREFIX mask; bias: [H, block, 3*block]
    where block = _flash_geometry(L, window//2)[0] and column c of the tile is
    relative offset c - block - row. Differentiable in q/k/v/bias (the tile
    gradient backpropagates into the learnable T5 bucket table outside)."""
    out, _ = _flash_fwd_impl(q, k, v, mask, window, interpret, bias=bias,
                             scale=scale)
    return out


def _flash_biased_vjp_fwd(q, k, v, mask, bias, window, scale, interpret):
    out, lse = _flash_fwd_impl(q, k, v, mask, window, interpret, bias=bias,
                               scale=scale)
    return out, (q, k, v, mask, bias, out, lse)


def _flash_biased_vjp_bwd(window, scale, interpret, res, do):
    q, k, v, mask, bias, out, lse = res
    dq, dk, dv, dbias = _flash_bwd_impl(
        q, k, v, mask, out, lse, do, window, interpret, bias=bias, scale=scale)
    return dq, dk, dv, _mask_cotangent(mask), dbias


flash_local_attention_biased.defvjp(_flash_biased_vjp_fwd,
                                    _flash_biased_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_local_attention(q, k, v, mask, window: int, interpret: bool = False):
    """Streaming-softmax sliding-window attention with a fused Pallas
    backward. q,k,v: [B, H, L, Dh]; mask: [B, L] PREFIX mask (1=valid);
    window = total span, even. Scaled scores, no bias support — the
    Longformer-family configuration (the LongT5 bias/unscaled path goes
    through flash_local_attention_biased)."""
    out, _ = _flash_fwd_impl(q, k, v, mask, window, interpret)
    return out


def _flash_vjp_fwd(q, k, v, mask, window, interpret):
    out, lse = _flash_fwd_impl(q, k, v, mask, window, interpret)
    return out, (q, k, v, mask, out, lse)


def _flash_vjp_bwd(window, interpret, res, do):
    q, k, v, mask, out, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, mask, out, lse, do, window, interpret)
    return dq, dk, dv, _mask_cotangent(mask)


flash_local_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Dropout variants: attention-probs dropout (HF semantics — drop the
# SOFTMAXED weights, rescale survivors by 1/keep) threaded through the same
# kernels. The 0/1 mask is drawn OUTSIDE the kernel with the exact
# jax.random.bernoulli call the XLA banded path makes (bit-identical masks
# when the block geometries coincide — see _drop_mask), passed as one
# banded-layout operand, and REGENERATED from the key in the backward: the
# residuals carry only the PRNG key, never the banded-size mask, so the
# auto-remat stored-activation estimate is unchanged vs the clean pair.
# Without these, every training configuration with active probs dropout
# (the reference's Transformer_segmenter maps dropout_out there; the dense
# and noffn families train at HF's default 0.1) fell back to the banded
# XLA path and its materialized score tensors.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_local_attention_dropped(q, k, v, mask, dropkey, window: int,
                                  rate: float, interpret: bool = False):
    """flash_local_attention + attention-probs dropout at `rate`, drawn from
    `dropkey` (a jax PRNG key). Scaled scores, no bias (Longformer family);
    training path only — eval calls the clean pair."""
    out, _ = _flash_fwd_impl(q, k, v, mask, window, interpret,
                             dropkey=dropkey, rate=rate)
    return out


def _flash_dropped_vjp_fwd(q, k, v, mask, dropkey, window, rate, interpret):
    out, lse = _flash_fwd_impl(q, k, v, mask, window, interpret,
                               dropkey=dropkey, rate=rate)
    return out, (q, k, v, mask, dropkey, out, lse)


def _flash_dropped_vjp_bwd(window, rate, interpret, res, do):
    q, k, v, mask, dropkey, out, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, mask, out, lse, do, window,
                                 interpret, dropkey=dropkey, rate=rate)
    return dq, dk, dv, _mask_cotangent(mask), _mask_cotangent(dropkey)


flash_local_attention_dropped.defvjp(_flash_dropped_vjp_fwd,
                                     _flash_dropped_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def flash_local_attention_biased_dropped(q, k, v, mask, bias, dropkey,
                                         window: int, rate: float,
                                         scale: bool = False,
                                         interpret: bool = False):
    """flash_local_attention_biased + attention-probs dropout at `rate`
    (the LongT5 family's T5Attention dropout_rate on the softmaxed
    weights). Differentiable in q/k/v/bias."""
    out, _ = _flash_fwd_impl(q, k, v, mask, window, interpret, bias=bias,
                             scale=scale, dropkey=dropkey, rate=rate)
    return out


def _flash_biased_dropped_vjp_fwd(q, k, v, mask, bias, dropkey, window, rate,
                                  scale, interpret):
    out, lse = _flash_fwd_impl(q, k, v, mask, window, interpret, bias=bias,
                               scale=scale, dropkey=dropkey, rate=rate)
    return out, (q, k, v, mask, bias, dropkey, out, lse)


def _flash_biased_dropped_vjp_bwd(window, rate, scale, interpret, res, do):
    q, k, v, mask, bias, dropkey, out, lse = res
    dq, dk, dv, dbias = _flash_bwd_impl(
        q, k, v, mask, out, lse, do, window, interpret, bias=bias,
        scale=scale, dropkey=dropkey, rate=rate)
    return dq, dk, dv, _mask_cotangent(mask), dbias, _mask_cotangent(dropkey)


flash_local_attention_biased_dropped.defvjp(_flash_biased_dropped_vjp_fwd,
                                            _flash_biased_dropped_vjp_bwd)
