"""Fused instance-norm + exact-GELU Pallas kernel.

The wav2vec2 feature extractor's first conv layer is followed by a group
norm with num_groups == num_channels (per-channel instance norm over time —
HF Wav2Vec2GroupNormConvLayer) and an exact GELU. At the predict-path shape
([150 units, 3199 frames, 512 ch] ≈ 1 GB f32) the XLA lowering is
HBM-bound: the norm's global time reduction forces the conv output to
materialize, then stats read + normalize read/write + gelu read/write make
~4-5 full passes over the tensor (measured ~8 ms of the ~31 ms encoder
chunk on one v5e).

This kernel does the stage in 2 contiguous reads + 1 write:

  grid (B, phase, T-blocks), sequential. Blocks span the FULL channel
  width (lane-contiguous DMA — a first attempt that blocked on the lane
  axis read 512-byte strided chunks and measured slower still).
  Phase 0 streams the time blocks and accumulates per-channel sum/sum-sq
  in VMEM scratch; phase 1 re-streams them, normalizes with the completed
  stats, applies GELU and writes. The output block index is constant
  during phase 0, so nothing is flushed until phase 1 fills it with real
  values — phase 0 costs no write traffic.

MEASURED OUTCOME (one v5e, 150x3199x512): XLA 9.3 ms, this kernel 17.4 ms,
the lane-blocked variant 16.2 ms. The stage is VPU-bound on the exact-GELU
erf/exp (~4 ms of transcendentals over 245M elements), which XLA's fusion
already overlaps with contiguous streaming; memory layout was not the
limiter. Kept as an OPT-IN (MTS_PALLAS_NORM=1, gated in
encoders/wav2vec2.py) with the numbers recorded so the experiment is not
silently redone — docs/PERFORMANCE.md "design decisions backed by
measurements".

erf is implemented in-kernel (Abramowitz & Stegun 7.1.26, max abs error
1.5e-7 — below f32 noise for GELU); Pallas TPU has no erf primitive.

Inference-only (pallas_call has no reverse-mode autodiff) — exactly the
wav2vec2 encode path, which this framework never trains through. The XLA
fallback in encoders/wav2vec2.py keeps CPU tests and any future training
use bit-exact.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_TB = 400  # time rows per block: [400, 512] f32 = 0.8 MB, multiple of 8


def _erf(x):
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, s_ref, b_ref, o_ref, acc_ref, *, t_valid: int, tb: int):
    ph = pl.program_id(1)
    t = pl.program_id(2)
    x = x_ref[0]  # [tb, C]
    # rows of this block that are real (the last block may be padding)
    row = t * tb + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = row < t_valid

    @pl.when(ph == 0)
    def _stats():
        @pl.when(t == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xm = jnp.where(valid, x, 0.0)
        acc_ref[0, :] += jnp.sum(xm, axis=0)
        acc_ref[1, :] += jnp.sum(xm * xm, axis=0)

    @pl.when(ph == 1)
    def _normalize():
        inv_n = 1.0 / t_valid
        mu = acc_ref[0, :] * inv_n
        var = jnp.maximum(acc_ref[1, :] * inv_n - mu * mu, 0.0)
        y = (x - mu) * jax.lax.rsqrt(var + _EPS) * s_ref[...] + b_ref[...]
        y = 0.5 * y * (1.0 + _erf(y * (1.0 / math.sqrt(2.0))))
        o_ref[0] = jnp.where(valid, y, 0.0)


def pallas_instance_norm_gelu(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, T, C] -> gelu(instance_norm(x)) with per-channel stats over
    the time axis (group norm with groups == C), C a multiple of 128."""
    B, T, C = x.shape
    assert C % 128 == 0, C
    tb = min(_TB, -(-T // 8) * 8)
    n_t = -(-T // tb)
    t_pad = n_t * tb - T
    if t_pad:
        x = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))

    out = pl.pallas_call(
        partial(_kernel, t_valid=T, tb=tb),
        grid=(B, 2, n_t),
        in_specs=[
            pl.BlockSpec((1, tb, C), lambda i, ph, t: (i, t, 0)),
            pl.BlockSpec((1, C), lambda i, ph, t: (0, 0)),
            pl.BlockSpec((1, C), lambda i, ph, t: (0, 0)),
        ],
        # constant block index during phase 0 -> no flush until phase 1
        # has overwritten the buffer with real values
        out_specs=pl.BlockSpec((1, tb, C), lambda i, ph, t: (i, t * ph, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_t * tb, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((8, C), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))
    return out[:, :T] if t_pad else out
