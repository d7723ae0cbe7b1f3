"""Length-mask utilities.

The reference builds per-batch padding masks from a Python loop over samples
(`models/NeuralArchitectures.py:11-21` in /root/reference). Here masks are
computed vectorised on device from a `[B]` lengths array so they can live
inside a jitted program with static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def length_mask(lengths: jnp.ndarray, max_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] mask, 1.0 for valid steps, 0.0 for padding."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return (pos < lengths.astype(jnp.int32)[:, None]).astype(dtype)


def reverse_in_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sequence within its valid length; padding stays in place.

    x: [B, L, ...], lengths: [B].  Equivalent to what packed-sequence
    bidirectional RNNs do in the reference (the backward direction starts at
    the true last step of each sample, not at the padded end).
    """
    B, L = x.shape[0], x.shape[1]
    t = lax.broadcasted_iota(jnp.int32, (B, L), 1)
    lens = lengths.astype(jnp.int32)[:, None]
    # index of the element that should land at position t after reversal
    src = jnp.where(t < lens, lens - 1 - t, t)
    return jnp.take_along_axis(
        x, src.reshape(src.shape + (1,) * (x.ndim - 2)), axis=1
    )
