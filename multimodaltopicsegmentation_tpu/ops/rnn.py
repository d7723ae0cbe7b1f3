"""Scan-based LSTM/GRU recurrences for TPU.

TPU-native replacement for the reference's cuDNN `nn.LSTM` + pack/pad wrapper
(/root/reference/models/NeuralArchitectures.py:23-146). Design:

- The input projection `x @ W_ih` for ALL timesteps is one large batched
  matmul (MXU-friendly); only the `h @ W_hh` recurrence runs inside
  `lax.scan` over time.
- Variable lengths are handled with masks and an in-length reversal
  (`reverse_in_length`) instead of packed sequences: because valid steps
  always precede padding (in both directions after the reversal), carries
  never cross from padding into valid steps, and outputs at padded steps are
  zeroed exactly like `pad_packed_sequence` does.
- Initialization replicates the reference's TF/Keras-style scheme
  (NeuralArchitectures.py:58-79): xavier-uniform W_ih, orthogonal W_hh,
  zero biases with LSTM forget-gate bias 1.

A fused Pallas LSTM kernel (VMEM-resident carry, grid over time blocks) was
prototyped and measured SLOWER than XLA's unrolled scan at the flagship
shape (2.15 ms vs 1.45 ms for [2,10]x512xH256 on v5e) — Mosaic's batched
small matmul lowering loses to XLA's scan pipeline here, so the scan is the
production path.

Gate orders match torch conventions so semantics are comparable:
LSTM gates (i, f, g, o); GRU gates (r, z, n).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .masks import length_mask, reverse_in_length


def _scan_unroll() -> int:
    """Scan unroll depth (default 8 — measured best at the 512-step
    flagship shape). Round-5 sweep at the 3600-step RecurrentLongT5 block
    shapes (scripts/bench_lstm_unroll.py, fwd+bwd): unroll 4/8 tie within
    noise (62.3/62.6 ms for both blocks), 16 costs +9%, 32/64 +36% — the
    scan is latency-bound on its sequential dependency, not on loop
    overhead, so the default stands for both regimes. MTS_LSTM_UNROLL
    overrides for experiments; read at trace time."""
    import os

    return int(os.environ.get("MTS_LSTM_UNROLL", "8"))


def lstm_params(rng, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    w_ih = jax.nn.initializers.xavier_uniform()(k1, (in_dim, 4 * hidden), dtype)
    w_hh = jax.nn.initializers.orthogonal()(k2, (hidden, 4 * hidden), dtype)
    # b_ih and b_hh are kept SEPARATE even though the forward pass only ever
    # uses their sum: torch parametrizes them as two tensors that each
    # receive the same gradient, so adaptive optimizers (Adam) take twice
    # the effective bias step a fused parametrization would — fusing them
    # changes training trajectories vs the reference (measured: ~1% loss
    # drift in 6 Adam steps). Forward cost is one [4H] add per apply.
    b_ih = jnp.zeros((4 * hidden,), dtype)
    # forget-gate bias = 1 on b_ih (torch layout i, f, g, o; reference
    # TF-style init, NeuralArchitectures.py:68-74)
    b_ih = b_ih.at[hidden : 2 * hidden].set(1.0)
    return {
        "w_ih": w_ih,
        "w_hh": w_hh,
        "b_ih": b_ih,
        "b_hh": jnp.zeros((4 * hidden,), dtype),
    }


def _lstm_bias(params: dict) -> jnp.ndarray:
    """Summed LSTM bias; accepts the legacy fused {'b'} layout (pre-r3
    checkpoints) as well as the torch-parity {'b_ih','b_hh'} split."""
    if "b" in params:
        return params["b"]
    return params["b_ih"] + params["b_hh"]


def gru_params(rng, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(rng)
    w_ih = jax.nn.initializers.xavier_uniform()(k1, (in_dim, 3 * hidden), dtype)
    w_hh = jax.nn.initializers.orthogonal()(k2, (hidden, 3 * hidden), dtype)
    b_ih = jnp.zeros((3 * hidden,), dtype)
    b_hh = jnp.zeros((3 * hidden,), dtype)
    return {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh}


def lstm_scan(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Unidirectional LSTM over [B, L, D] -> [B, L, H]."""
    B, L, _ = x.shape
    H = params["w_hh"].shape[0]
    # One big MXU matmul for the input projection of every timestep.
    xp = jnp.einsum("bld,dg->blg", x, params["w_ih"]) + _lstm_bias(params)
    xp = jnp.transpose(xp, (1, 0, 2))  # time-major for scan

    w_hh = params["w_hh"]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x.dtype)
    c0 = jnp.zeros((B, H), x.dtype)
    # unroll amortizes scan-iteration overhead on TPU (~25% measured on v5e)
    _, ys = lax.scan(step, (h0, c0), xp, unroll=_scan_unroll())
    return jnp.transpose(ys, (1, 0, 2))


def gru_scan(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Unidirectional GRU over [B, L, D] -> [B, L, H] (torch gate layout)."""
    B, L, _ = x.shape
    H = params["w_hh"].shape[0]
    xp = jnp.einsum("bld,dg->blg", x, params["w_ih"]) + params["b_ih"]
    xp = jnp.transpose(xp, (1, 0, 2))

    w_hh = params["w_hh"]
    b_hh = params["b_hh"]

    def step(h, xp_t):
        hp = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((B, H), x.dtype)
    _, ys = lax.scan(step, h0, xp, unroll=_scan_unroll())
    return jnp.transpose(ys, (1, 0, 2))


def bidirectional_rnn(
    fwd_params: dict,
    bwd_params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    cell: str = "lstm",
) -> jnp.ndarray:
    """Bidirectional recurrence -> [B, L, 2H], padding zeroed.

    The backward direction reverses each sequence within its own length so it
    starts from the true final step (packed-sequence semantics). Both
    directions run as ONE scan over a direction-stacked batch (the per-step
    gate matmul becomes a single batched matmul over [2, B, H] — ~1.9x
    faster than two sequential scans on v5e, bit-identical results).
    """
    B, L, _ = x.shape
    mask = length_mask(lengths, L, x.dtype)[..., None]
    x_r = reverse_in_length(x, lengths)
    xs = jnp.stack([x, x_r])  # [2, B, L, D]

    if cell == "lstm":
        H = fwd_params["w_hh"].shape[0]
        wis = jnp.stack([fwd_params["w_ih"], bwd_params["w_ih"]])
        whs = jnp.stack([fwd_params["w_hh"], bwd_params["w_hh"]])
        bs = jnp.stack([_lstm_bias(fwd_params), _lstm_bias(bwd_params)])
        xp = jnp.einsum("zbld,zdg->zblg", xs, wis) + bs[:, None, None, :]
        xp = jnp.transpose(xp, (2, 0, 1, 3))  # [L, 2, B, 4H]

        def step(carry, xp_t):
            h, c = carry
            gates = xp_t + jnp.einsum("zbh,zhg->zbg", h, whs)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((2, B, H), x.dtype)
        c0 = jnp.zeros((2, B, H), x.dtype)
        _, ys = lax.scan(step, (h0, c0), xp, unroll=_scan_unroll())
    else:
        H = fwd_params["w_hh"].shape[0]
        wis = jnp.stack([fwd_params["w_ih"], bwd_params["w_ih"]])
        whs = jnp.stack([fwd_params["w_hh"], bwd_params["w_hh"]])
        b_ihs = jnp.stack([fwd_params["b_ih"], bwd_params["b_ih"]])
        b_hhs = jnp.stack([fwd_params["b_hh"], bwd_params["b_hh"]])
        xp = jnp.einsum("zbld,zdg->zblg", xs, wis) + b_ihs[:, None, None, :]
        xp = jnp.transpose(xp, (2, 0, 1, 3))

        def step(h, xp_t):
            hp = jnp.einsum("zbh,zhg->zbg", h, whs) + b_hhs[:, None, :]
            xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((2, B, H), x.dtype)
        _, ys = lax.scan(step, h0, xp, unroll=_scan_unroll())

    ys = jnp.transpose(ys, (1, 2, 0, 3))  # [2, B, L, H]
    y_b = reverse_in_length(ys[1], lengths)
    return jnp.concatenate([ys[0], y_b], axis=-1) * mask


def unidirectional_rnn(
    params: dict, x: jnp.ndarray, lengths: Optional[jnp.ndarray], cell: str = "lstm"
) -> jnp.ndarray:
    scan_fn = lstm_scan if cell == "lstm" else gru_scan
    y = scan_fn(params, x)
    if lengths is not None:
        y = y * length_mask(lengths, x.shape[1], x.dtype)[..., None]
    return y
