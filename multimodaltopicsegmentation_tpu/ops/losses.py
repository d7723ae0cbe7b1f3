"""Loss functions for boundary tagging.

Semantics match the reference exactly where it matters for parity:

- sigmoid focal loss: RetinaNet form with alpha=0.9, gamma=2 defaults
  (/root/reference/models/focal_loss.py:5-57); computed from logits with a
  numerically-stable BCE-with-logits inside.
- BCE: probabilities are produced by an explicit sigmoid in the reference
  (models/CRF.py:346-352), so `bce_loss` takes logits and fuses the sigmoid.
- Cross entropy with ignore_index=-1 (models/CRF.py:298) — padded positions
  carry target -1 and are excluded from the mean.

All losses take a `[N]` validity mask instead of Python-level unpadding
(the reference concatenates per-sample slices on host,
models/CRF.py:344-352); masked mean over valid elements is identical math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy from logits (stable form)."""
    # max(x,0) - x*y + log(1+exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    alpha: float = 0.9,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Masked-mean sigmoid focal loss (RetinaNet form).

    Matches /root/reference/models/focal_loss.py: ce * (1-p_t)^gamma,
    optionally alpha-weighted, mean over valid elements.
    """
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * jnp.power(1.0 - p_t, gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked-mean BCE; reference applies sigmoid then nn.BCELoss."""
    loss = bce_with_logits(logits, targets)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy_ignore_index(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = -1
) -> jnp.ndarray:
    """CE over [N, C] logits with integer targets; ignore_index excluded.

    Reference: nn.CrossEntropyLoss(ignore_index=-1) over flattened
    [B*L, C] scores (models/CRF.py:298,355) — note the reference does NOT
    unpad for CE, it relies on the -1 padding label, which we replicate.
    """
    valid = (targets != ignore_index).astype(logits.dtype)
    safe_t = jnp.where(targets == ignore_index, 0, targets).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=-1)[:, 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
