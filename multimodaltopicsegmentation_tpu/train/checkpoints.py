"""Checkpointing with the reference's on-disk naming contract.

The reference encodes epoch / monitored loss / threshold into the checkpoint
filename `checkpoint-epoch=XX-val_loss=Y.YYYY-threshold=0.ZZ.ckpt`
(train_fit.py:235-241) and later parses threshold and val-loss back out of
the file name by string-splitting on '=' (train_fit.py:337-338); the
last-epoch path is saved as `final=0.500.ckpt` (train_fit.py:340-342) and
the winning checkpoint renamed `best_model` (train_fit.py:487-494). All of
that is preserved so downstream tooling (predict.py) keeps working.

Payload format: a pickle of numpy-ified params + the tagger config + the
architecture name. (Simple, dependency-free, and robust across jax versions;
orbax is unnecessary ceremony for single-host top-1 checkpoints.)
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Tuple

import jax
import numpy as np

from ..models.base import TaggerConfig


def checkpoint_name(epoch: int, monitored: float, threshold: float = 0.5) -> str:
    return f"checkpoint-epoch={epoch:02d}-val_loss={monitored:.4f}-threshold={threshold:.2f}.ckpt"


def parse_checkpoint_name(path: str) -> Tuple[float, float]:
    """-> (threshold, val_loss), reference parse (train_fit.py:337-338).

    The `final=0.500.ckpt` shape this module also writes has no epoch/loss
    fields — the split-based parse would choke on it (the reference's own
    parse crashes there), so it short-circuits to the save-last threshold
    and a NaN SENTINEL for the loss: there is no monitored loss in that
    filename, and a synthesized number must not be mistakable for a real
    one in best-config selection. Call sites resolve the NaN explicitly
    (see cli/train_fit._resolve_monitored)."""
    if os.path.basename(path).startswith("final="):
        return 0.5, float("nan")
    threshold = float(path.split("=")[-1][:4])
    val_loss = float(path.split("=")[-2][:6])
    return threshold, val_loss


def save(path: str, params, cfg: TaggerConfig, architecture: str, extra: dict = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "cfg": dataclasses.asdict(cfg),
        "architecture": architecture,
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    cfg_dict = payload["cfg"]
    cfg_dict.pop("dtype", None)
    cfg = TaggerConfig(**cfg_dict)
    return payload["params"], cfg, payload["architecture"], payload.get("extra", {})
