#!/usr/bin/env python
"""A/B the flagship long-document transformer train step: XLA banded
attention vs the flash (streaming-softmax) Pallas fwd+bwd pair.

Flagship config (docs/PERFORMANCE.md): batch 10 x 3600 units, D=768,
d_ff=256, 2 layers, 8 heads, pyramidal windows [240, 120], per-layer
rematerialization, focal loss, Adam. Harness: queue 20 steps, fence on a
SCALAR device->host transfer (per-call syncs measure the ~30 ms axon
tunnel, not the chip).

Also drives the T5-biased family: `RecurrentLongT5` at the same shape. At
batch 10 the XLA banded path CRASHES the TPU worker (its [B,H,nb,block,3b]
score tensor is 4.15 GB); the biased flash pair runs it at 106.4 ms/step.
At batch 2 (both fit): XLA 39.4 vs flash 38.1 ms at identical loss.

Remat follows the trace-time auto policy (stores activations at these
flagship shapes on TPU: Transformer 50.1 ms/step vs 67.6 remat'd,
RecurrentLongT5 106.4 vs 117.7); set MTS_REMAT=1/0 to force either leg.

Usage: python scripts/bench_longdoc_attention.py [xla|flash|both] [arch] [batch] [drop]
  arch:  Transformer (default) | RecurrentLongT5
  batch: default 10
  drop:  attention-probs dropout rate (default 0.0). For Transformer it is
         passed as dropout_out (-> attn_drop, attention-only); for
         RecurrentLongT5 as dropout_in (the T5 blocks' dropout_rate, which
         HF applies to hidden states AND attention weights). Nonzero rates
         A/B the round-4 dropped flash pair against the banded XLA path
         that previously served every regularized training config.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(mode: str, arch_name: str = "Transformer", B: int = 10,
            drop: float = 0.0):
    os.environ["MTS_FLASH_ATTENTION"] = "1" if mode == "flash" else "0"
    import jax
    import jax.numpy as jnp
    import optax

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

    L, D = 3600, 768
    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=256, num_layers=2, nheads=8,
        # 'Classic' = the dense restricted=False Transformer_segmenter
        # variant (registry encodes it as attention_window=0)
        attention_window=0 if arch_name == "Classic" else 120,
        loss_fn="FocalLoss",
        dropout_out=drop if arch_name in ("Transformer", "Classic") else 0.0,
        dropout_in=drop if arch_name not in ("Transformer", "Classic") else 0.0,
    )
    arch = build("Transformer" if arch_name == "Classic" else arch_name, cfg)
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
    key = jax.random.PRNGKey(1)
    params, state, loss = js(params, state, x, lengths, tags, key)
    print(f"[{mode}] compiled; loss={float(loss):.5f}", file=sys.stderr)
    best = float("inf")
    for trial in range(3):
        t0 = time.time()
        for _ in range(20):
            params, state, loss = js(params, state, x, lengths, tags, key)
        float(loss)  # scalar fence
        dt = (time.time() - t0) / 20
        best = min(best, dt)
        print(f"[{mode}] trial {trial}: {dt * 1e3:.2f} ms/step", file=sys.stderr)
    print(f"{mode}: {best * 1e3:.2f} ms/step (best of 3 trials of 20)")
    return best


def measure_stages(arch_name: str = "RecurrentLongT5", B: int = 10):
    """Stage breakdown BY SUBSTITUTION (the wav2vec2 technique,
    docs/PERFORMANCE.md): re-time the full train step with one stage at a
    time replaced by a shape-preserving no-op, and attribute the delta.

    Variants (RecurrentLongT5):
      full      — the production step
      no_lstm   — each block's BiLSTM -> slice+duplicate projection
                  (removes BOTH 3600-step scans and their backward)
      no_attn   — T5 _attend -> identity (removes qkv/o projections,
                  the biased flash pair and the bias-table gradient;
                  keeps RMSNorm/FFN/residual/dropout)
      no_bias   — relative bias off (unbiased flash pair; removes the
                  bias tile + its bucket-table gradient accumulation)
      no_t5     — the whole T5 block -> identity (leaves LSTMs + head)
    """
    os.environ["MTS_FLASH_ATTENTION"] = "1"
    import jax
    import jax.numpy as jnp
    import optax

    from multimodaltopicsegmentation_tpu.models import transformers as tr
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

    L, D = 3600, 768
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.05).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    def fake_birnn(fwd, bwd, xx, lens, cell="lstm"):
        H = fwd["w_hh"].shape[0]
        return jnp.concatenate([xx[..., :H], xx[..., :H]], axis=-1)

    def time_variant(label, patches):
        saved = [(obj, name, getattr(obj, name)) for obj, name, _ in patches]
        try:
            for obj, name, repl in patches:
                setattr(obj, name, repl)
            cfg = TaggerConfig(
                embedding_dim=D, hidden_dim=256, num_layers=2, nheads=8,
                attention_window=120, loss_fn="FocalLoss",
            )
            arch = build(arch_name, cfg)
            params = arch.init(jax.random.PRNGKey(0))
            tx = make_optimizer("Adam", 1e-3)
            state = tx.init(params)

            def step(params, state, x, lengths, tags, rng):
                loss, g = jax.value_and_grad(
                    lambda p: arch.loss(p, x, lengths, tags, rng=rng)
                )(params)
                u, state = tx.update(g, state, params)
                return optax.apply_updates(params, u), state, loss

            js = jax.jit(step, donate_argnums=(0, 1))
            key = jax.random.PRNGKey(1)
            params, state, loss = js(params, state, x, lengths, tags, key)
            print(f"[{label}] compiled; loss={float(loss):.5f}", file=sys.stderr)
            best = float("inf")
            for trial in range(3):
                t0 = time.time()
                for _ in range(20):
                    params, state, loss = js(params, state, x, lengths, tags, key)
                float(loss)  # scalar fence
                best = min(best, (time.time() - t0) / 20)
            print(f"{label}: {best * 1e3:.2f} ms/step")
            return best
        finally:
            for obj, name, orig in saved:
                setattr(obj, name, orig)

    results = {}
    results["full"] = time_variant("full", [])
    results["no_lstm"] = time_variant(
        "no_lstm", [(tr, "bidirectional_rnn", fake_birnn)])
    results["no_attn"] = time_variant(
        "no_attn",
        [(tr, "_attend",
          lambda p, xx, nheads, mask, window=None, bias_fn=None, scale=True,
                 probs_drop=0.0, rng=None: xx)])
    results["no_bias"] = time_variant(
        "no_bias", [(tr, "relative_bias_fn", lambda table, nb, md: None)])
    results["no_t5"] = time_variant(
        "no_t5",
        [(tr.LongT5Encoder, "apply",
          lambda self, p, xx, lens, train=False, rng=None: xx)])

    full = results["full"]
    print("--- attribution (full minus variant) ---")
    for k in ("no_lstm", "no_attn", "no_bias", "no_t5"):
        print(f"{k}: {(full - results[k]) * 1e3:+.2f} ms "
              f"(variant {results[k] * 1e3:.2f})")
    return results


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    arch_name = sys.argv[2] if len(sys.argv) > 2 else "Transformer"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    drop = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    if which == "stages":
        measure_stages(arch_name, B)
    else:
        if which in ("xla", "both"):
            measure("xla", arch_name, B, drop)
        if which in ("flash", "both"):
            measure("flash", arch_name, B, drop)
