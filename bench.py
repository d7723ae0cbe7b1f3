#!/usr/bin/env python
"""Benchmark: flagship BiLSTM tagger training throughput, TPU vs reference.

Times the jitted full training step (forward + backward + Adam) of the
paper's workhorse configuration (BiLSTM h=256 x2 layers over 768-d wav2vec
embeddings, batch 10, 512 units/doc) on the available accelerator, and the
same computation implemented the reference's way (torch nn.LSTM packed
sequences + focal loss) on CPU as the baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

B, L, D, H, LAYERS = 10, 512, 768, 256, 2
STEPS = 20
BASELINE_STEPS = 5


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

    cfg = TaggerConfig(embedding_dim=D, hidden_dim=H, num_layers=LAYERS, loss_fn="FocalLoss")
    arch = build("BiLSTM", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    tx = make_optimizer("Adam", 1e-3)
    state = tx.init(params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.05).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    def step(params, state, x, lengths, tags, rng):
        loss, g = jax.value_and_grad(
            lambda p: arch.loss(p, x, lengths, tags, rng=rng)
        )(params)
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state, loss

    js = jax.jit(step, donate_argnums=(0, 1))
    k = jax.random.PRNGKey(1)
    # On the tunneled axon backend block_until_ready does not fully fence;
    # a device->host scalar transfer does. Run two timed loops and report
    # the second (the first may partly measure enqueue into an empty queue).
    dt = None
    for _trial in range(3):
        t0 = time.time()
        for _ in range(STEPS):
            params, state, loss = js(params, state, x, lengths, tags, k)
        float(loss)  # hard sync: forces the whole dependency chain
        dt = (time.time() - t0) / STEPS
    return B * L / dt


def bench_torch_cpu() -> float:
    import torch
    import torch.nn as nn
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    torch.manual_seed(0)

    class RefBiLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTM(D, H, num_layers=LAYERS, batch_first=True, bidirectional=True)
            self.cls = nn.Linear(2 * H, 1)

        def forward(self, x, lengths):
            packed = pack_padded_sequence(x, lengths, batch_first=True, enforce_sorted=False)
            h0 = torch.zeros(2 * LAYERS, x.shape[0], H)
            c0 = torch.zeros(2 * LAYERS, x.shape[0], H)
            out, _ = self.rnn(packed, (h0, c0))
            out, _ = pad_packed_sequence(out, batch_first=True)
            return self.cls(out)

    def focal(logits, t, alpha=0.9, gamma=2.0):
        p = torch.sigmoid(logits)
        ce = nn.functional.binary_cross_entropy_with_logits(logits, t, reduction="none")
        pt = p * t + (1 - p) * (1 - t)
        return (((alpha * t + (1 - alpha) * (1 - t))) * ce * (1 - pt) ** gamma).mean()

    m = RefBiLSTM()
    opt = torch.optim.Adam(m.parameters(), lr=1e-3, eps=1e-7)
    x = torch.randn(B, L, D)
    tags = (torch.rand(B, L) < 0.05).float()
    lengths = [L] * B

    opt.zero_grad()
    focal(m(x, lengths)[..., 0], tags).backward()
    opt.step()  # warmup

    t0 = time.time()
    for _ in range(BASELINE_STEPS):
        opt.zero_grad()
        loss = focal(m(x, lengths)[..., 0], tags)
        loss.backward()
        opt.step()
    dt = (time.time() - t0) / BASELINE_STEPS
    return B * L / dt


def main():
    value = bench_jax()
    baseline = bench_torch_cpu()
    print(
        json.dumps(
            {
                "metric": "bilstm_train_units_per_sec",
                "value": round(value, 1),
                "unit": "units/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
