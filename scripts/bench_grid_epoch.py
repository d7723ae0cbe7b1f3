#!/usr/bin/env python
"""Wall-clock per `GridTrainer.fit` epoch at the flagship lockstep shape
(9 dropout configs vmapped, 4 flagship batches). The vmapped step itself is
~68 ms (docs/PERFORMANCE.md); this measures everything around it — the two
per-epoch stacked loss pulls, the per-config host decision loop, and the
on-device best-snapshot copies.

Measured (round 4, one v5e): 0.310 s/epoch marginal against a ~0.29 s
compute floor (4 x 68 ms vmapped train steps + one vmapped eval), i.e. the
host grid loop is already within ~6% of floor — which is why GridTrainer
did NOT get the device-resident epoch windows Trainer.fit has
(train/device_fit.py): there the per-epoch overhead was ~120 ms against a
35 ms floor. Don't rebuild that machinery here without new data.

Usage: python scripts/bench_grid_epoch.py [epochs]
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.train.grid import GridTrainer

    B, L, D = 10, 512, 768

    def batch(seed):
        r = np.random.default_rng(seed)
        return {
            "src_tokens": r.standard_normal((B, L, D)).astype(np.float32),
            "src_lengths": np.full((B,), L, np.int32),
            "tgt_tokens": (r.random((B, L)) < 0.05).astype(np.float32),
        }

    train_batches = [batch(s) for s in range(4)]
    valid_batches = [batch(100)]
    grid = [(d, o) for d in (0.0, 0.1, 0.2) for o in (0.0, 0.1, 0.2)]

    cfg = TaggerConfig(embedding_dim=D, hidden_dim=256, num_layers=2,
                       loss_fn="FocalLoss")
    with tempfile.TemporaryDirectory() as tmp:
        def fit(n):
            tr = GridTrainer("BiLSTM", cfg, grid, lr=1e-3, max_epochs=n,
                             no_early_stop=True,
                             check_dir=os.path.join(tmp, "ck"))
            t0 = time.time()
            tr.fit(train_batches, valid_batches)
            return time.time() - t0

        # GridTrainer builds its jitted step inside fit(), so every fit
        # pays a fixed compile-fetch + upload cost; a two-point difference
        # quotient isolates the per-epoch marginal cost.
        fit(2)  # populate the (server-side) compile cache
        lo, hi = 10, 10 + epochs
        t_lo, t_hi = fit(lo), fit(hi)
        per_epoch = (t_hi - t_lo) / (hi - lo)
    print(json.dumps({
        "metric": "grid_epoch_sec",
        "value": round(per_epoch, 4),
        "epochs_lo": lo,
        "epochs_hi": hi,
        "sec_lo": round(t_lo, 2),
        "sec_hi": round(t_hi, 2),
        "configs": len(grid),
        "batches": len(train_batches),
    }))


if __name__ == "__main__":
    main()
