#!/usr/bin/env python
"""Scan-unroll sweep for the BiLSTM recurrence at the long-document shape.

Round-5 follow-up to the RecurrentLongT5 stage breakdown
(scripts/bench_longdoc_attention.py stages): the two per-block BiLSTMs cost
~73 ms of the 106.75 ms flagship 10x3600 step — serial scan latency the
pure-attention family does not pay. This sweeps lax.scan's unroll depth
(MTS_LSTM_UNROLL) for the isolated fwd+bwd BiLSTM at the exact block shapes
(768->256 and 512->256, B=10, L=3600) to see whether a deeper unroll
amortizes more loop overhead at 7x the flagship 512-step length.

Usage: python scripts/bench_lstm_unroll.py [unroll ...]   (default 4 8 16 32 64)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(unroll: int, B=10, L=3600, shapes=((768, 256), (512, 256))):
    os.environ["MTS_LSTM_UNROLL"] = str(unroll)
    import jax
    import jax.numpy as jnp

    from multimodaltopicsegmentation_tpu.ops.rnn import (
        bidirectional_rnn,
        lstm_params,
    )

    rng = np.random.default_rng(0)
    total = 0.0
    for D, H in shapes:
        kf, kb = jax.random.split(jax.random.PRNGKey(D))
        pf, pb = lstm_params(kf, D, H), lstm_params(kb, D, H)
        x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
        lengths = jnp.asarray(np.full((B,), L, np.int32))

        def loss(pf, pb, x):
            return jnp.sum(bidirectional_rnn(pf, pb, x, lengths) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        out = g(pf, pb, x)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]["w_hh"]))  # hard fence (axon)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                out = g(pf, pb, x)
            float(jnp.sum(out[0]["w_hh"]))
            best = min(best, (time.time() - t0) / 10)
        print(f"unroll={unroll} [{D}->{H}] fwd+bwd: {best * 1e3:.2f} ms")
        total += best
    print(f"unroll={unroll} TOTAL (both block shapes): {total * 1e3:.2f} ms")
    return total


if __name__ == "__main__":
    unrolls = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32, 64]
    results = {}
    for u in unrolls:
        results[u] = measure(u)
    best = min(results, key=results.get)
    print(f"best: unroll={best} at {results[best] * 1e3:.2f} ms")
