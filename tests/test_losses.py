"""Loss parity vs torch implementations the reference uses."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodaltopicsegmentation_tpu.ops import losses as L


def _focal_torch(logits, targets, alpha=0.9, gamma=2.0):
    """Direct transcription of models/focal_loss.py semantics."""
    inputs = torch.from_numpy(logits)
    tg = torch.from_numpy(targets)
    p = torch.sigmoid(inputs)
    ce = F.binary_cross_entropy_with_logits(inputs, tg, reduction="none")
    p_t = p * tg + (1 - p) * (1 - tg)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * tg + (1 - alpha) * (1 - tg)
        loss = alpha_t * loss
    return loss.mean().item()


def test_focal_loss_matches_reference_form(rng):
    logits = rng.standard_normal(40).astype(np.float32) * 3
    targets = (rng.random(40) < 0.2).astype(np.float32)
    mask = np.ones(40, np.float32)
    ours = float(L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)))
    theirs = _focal_torch(logits, targets)
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_focal_loss_mask_equals_unpadded(rng):
    logits = rng.standard_normal(20).astype(np.float32)
    targets = (rng.random(20) < 0.3).astype(np.float32)
    mask = np.concatenate([np.ones(13, np.float32), np.zeros(7, np.float32)])
    ours = float(L.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)))
    theirs = _focal_torch(logits[:13], targets[:13])
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_bce_matches_torch(rng):
    logits = rng.standard_normal(30).astype(np.float32)
    targets = (rng.random(30) < 0.5).astype(np.float32)
    mask = np.ones(30, np.float32)
    ours = float(L.bce_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)))
    theirs = F.binary_cross_entropy(
        torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(targets)
    ).item()
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_ce_ignore_index_matches_torch(rng):
    logits = rng.standard_normal((25, 2)).astype(np.float32)
    targets = rng.integers(0, 2, 25).astype(np.int64)
    targets[18:] = -1  # padding
    ours = float(
        L.cross_entropy_ignore_index(jnp.asarray(logits), jnp.asarray(targets))
    )
    theirs = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets), ignore_index=-1
    ).item()
    assert ours == pytest.approx(theirs, rel=1e-5)
