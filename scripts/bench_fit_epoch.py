#!/usr/bin/env python
"""Wall-clock per `Trainer.fit` epoch at the flagship BiLSTM shape.

The jitted step itself is ~9 ms (bench.py `train_step_ms`); what this
script measures is everything AROUND it — host pulls of per-batch losses,
scheduler/early-stop bookkeeping, on-device best-snapshot copies — which
dominates epoch time on the axon tunnel (~30 ms per device->host round
trip). PERFORMANCE.md's "s/epoch" number comes from here.

Usage: python scripts/bench_fit_epoch.py [epochs]
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
    from multimodaltopicsegmentation_tpu.train.loop import Trainer

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

    cfg = TaggerConfig(embedding_dim=D, hidden_dim=256, num_layers=2,
                       loss_fn="FocalLoss")
    with tempfile.TemporaryDirectory() as tmp:
        tr = Trainer("BiLSTM", cfg, lr=1e-3, max_epochs=epochs,
                     no_early_stop=True, check_dir=os.path.join(tmp, "ck"))
        # warmup on the SAME instance: the jitted step/eval caches are
        # per-Trainer, so warming a second instance would leave retraces
        # and a compile-cache round trip inside the timed region
        tr.max_epochs = 2
        tr.fit(train_batches, valid_batches)
        tr.max_epochs = epochs

        t0 = time.time()
        tr.fit(train_batches, valid_batches)
        dt = time.time() - t0
    per_epoch = dt / epochs
    print(json.dumps({
        "metric": "fit_epoch_sec",
        "value": round(per_epoch, 4),
        "epochs": epochs,
        "total_sec": round(dt, 2),
        "batches": len(train_batches),
    }), flush=True)


if __name__ == "__main__":
    main()
