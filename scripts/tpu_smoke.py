#!/usr/bin/env python
"""TPU smoke suite: compile + run every hot path on the REAL device.

The pytest suite deliberately pins itself to the 8-virtual-device CPU mesh
(tests/conftest.py) for exact numerics, which means nothing CI-shaped
asserts that the axon/TPU lowering of each kernel still works. This script
is that check: tiny shapes, one pass per subsystem, PASS/FAIL per line,
exit code 1 if anything fails.

Run directly (`python scripts/tpu_smoke.py`) or through the env-gated
pytest wrapper (`MTS_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py`).
"""
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _check(name, fn):
    try:
        fn()
        print(f"PASS {name}")
        return True
    except Exception:
        print(f"FAIL {name}")
        traceback.print_exc()
        return False


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    rng = np.random.default_rng(0)
    ok = True

    def flagship_decode():
        from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
        from multimodaltopicsegmentation_tpu.models.registry import build

        cfg = TaggerConfig(embedding_dim=64, hidden_dim=32, num_layers=2, loss_fn="FocalLoss")
        arch = build("BiLSTM", cfg)
        params = arch.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((2, 48, 64)), jnp.float32)
        lengths = jnp.asarray([48, 30])
        scores, tags = jax.jit(lambda p, a, l: arch.decode(p, a, l, 0.5))(params, x, lengths)
        assert np.all(np.isfinite(np.asarray(scores)))

    def flagship_grad_step():
        import optax

        from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
        from multimodaltopicsegmentation_tpu.models.registry import build
        from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

        cfg = TaggerConfig(embedding_dim=32, hidden_dim=16, num_layers=1, loss_fn="FocalLoss")
        arch = build("BiLSTM", cfg)
        params = arch.init(jax.random.PRNGKey(0))
        tx = make_optimizer("Adam", 1e-3)
        state = tx.init(params)
        x = jnp.asarray(rng.standard_normal((2, 32, 32)), jnp.float32)
        tags = jnp.asarray((rng.random((2, 32)) < 0.1).astype(np.float32))
        lengths = jnp.asarray([32, 32])

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(lambda q: arch.loss(q, x, lengths, tags, rng=None))(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        _, _, loss = step(params, state)
        assert np.isfinite(float(loss))

    def crf_viterbi():
        from multimodaltopicsegmentation_tpu.ops import crf

        params = crf.crf_params(jax.random.PRNGKey(0), 8, 2)
        feats = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
        mask = jnp.ones((2, 20), jnp.float32)
        score, paths = jax.jit(crf.viterbi_decode)(params, feats, mask)
        assert np.asarray(paths).shape == (2, 20)

    def blocked_local_attention():
        from multimodaltopicsegmentation_tpu.ops.attention import local_attention

        q = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
        mask = jnp.ones((1, 64), jnp.float32)
        out = jax.jit(lambda q, m: local_attention(q, q, q, 16, m))(q, mask)
        assert np.all(np.isfinite(np.asarray(out)))

    def flash_attention_grad():
        # the TPU-default training path: flash Pallas fwd + custom_vjp bwd
        from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
            flash_local_attention,
        )

        q = jnp.asarray(rng.standard_normal((1, 2, 128, 16)), jnp.float32)
        mask = jnp.ones((1, 128), jnp.float32)
        grads = jax.jit(
            jax.grad(lambda q, m: jnp.sum(flash_local_attention(q, q, q, m, 32) ** 2))
        )(q, mask)
        assert np.all(np.isfinite(np.asarray(grads)))

    def flash_biased_attention_grad():
        # the TPU-default T5-family path: biased flash pair + table gradient
        from multimodaltopicsegmentation_tpu.ops.attention import (
            local_attention, relative_bias_fn,
        )

        q = jnp.asarray(rng.standard_normal((1, 2, 128, 16)), jnp.float32)
        mask = jnp.ones((1, 128), jnp.float32)
        table = jnp.asarray(rng.standard_normal((8, 2)) * 0.1, jnp.float32)

        def loss(q, tbl):
            o = local_attention(q, q, q, 32, mask,
                                bias_fn=relative_bias_fn(tbl, 8, 33),
                                scale=False)
            return jnp.sum(o ** 2)

        gq, gt = jax.jit(jax.grad(loss, argnums=(0, 1)))(q, table)
        assert np.all(np.isfinite(np.asarray(gq)))
        assert np.all(np.isfinite(np.asarray(gt)))

    def flash_dropped_attention_grad():
        # the TPU training path under ACTIVE attention-probs dropout: the
        # dropped flash pair (mask drawn outside, regenerated in backward)
        from multimodaltopicsegmentation_tpu.ops.attention import local_attention

        q = jnp.asarray(rng.standard_normal((1, 2, 128, 16)), jnp.float32)
        mask = jnp.ones((1, 128), jnp.float32)
        key = jax.random.PRNGKey(0)

        def loss(q, key):
            o = local_attention(q, q, q, 32, mask, probs_drop=0.2, rng=key)
            return jnp.sum(o ** 2)

        grads = jax.jit(jax.grad(loss))(q, key)
        assert np.all(np.isfinite(np.asarray(grads)))

    def pallas_kernel():
        from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
            pallas_local_attention,
        )

        q = jnp.asarray(rng.standard_normal((1, 2, 128, 16)), jnp.float32)
        mask = jnp.ones((1, 128), jnp.float32)
        out = jax.jit(lambda q, m: pallas_local_attention(q, q, q, 32, m))(q, mask)
        assert np.all(np.isfinite(np.asarray(out)))

    def pallas_norm_kernel():
        from multimodaltopicsegmentation_tpu.encoders.wav2vec2 import _group_norm
        from multimodaltopicsegmentation_tpu.ops.pallas_norm import (
            pallas_instance_norm_gelu,
        )

        x = jnp.asarray(rng.standard_normal((2, 100, 128)), jnp.float32)
        scale = jnp.ones((128,))
        bias = jnp.zeros((128,))
        out = jax.jit(pallas_instance_norm_gelu)(x, scale, bias)
        ref = jax.nn.gelu(
            _group_norm({"scale": scale, "bias": bias}, x, groups=128),
            approximate=False,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    def crdnn_vad_posteriors():
        from multimodaltopicsegmentation_tpu.encoders import crdnn_vad

        params = crdnn_vad.random_params(jax.random.PRNGKey(0))
        audio = (0.1 * rng.standard_normal(2 * 16000)).astype(np.float32)
        post = crdnn_vad.posteriors(params, audio, 16000)
        assert post.shape[0] > 0 and np.all((post >= 0) & (post <= 1))

    def prosodic_frontend():
        from multimodaltopicsegmentation_tpu.dsp.prosody import mfcc_features, prosodic_features

        sr = 16000
        units = jnp.asarray(rng.standard_normal((4, sr)), jnp.float32) * 0.1
        lengths = jnp.full((4,), sr, jnp.int32)
        m = mfcc_features(units, lengths, sr)
        assert np.asarray(m).shape == (4, 200)
        p = prosodic_features(units, lengths, sr)
        assert np.asarray(p).shape[1] == 167

    def wav2vec2_forward():
        from multimodaltopicsegmentation_tpu.encoders import wav2vec2 as w

        cfg = w.Wav2Vec2Config.tiny()
        params = w.init_params(jax.random.PRNGKey(0), cfg)
        audio = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
        out = jax.jit(lambda p, a: w.apply(p, cfg, a))(params, audio)
        assert np.all(np.isfinite(np.asarray(out)))

    def transformer_decode():
        from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
        from multimodaltopicsegmentation_tpu.models.registry import build

        cfg = TaggerConfig(embedding_dim=32, hidden_dim=32, num_layers=2,
                           nheads=2, attention_window=8, loss_fn="FocalLoss")
        arch = build("Transformer", cfg)
        params = arch.init(jax.random.PRNGKey(0))
        x = jnp.asarray(rng.standard_normal((1, 64, 32)), jnp.float32)
        scores, tags = jax.jit(lambda p, a, l: arch.decode(p, a, l, 0.5))(
            params, x, jnp.asarray([64])
        )
        assert np.all(np.isfinite(np.asarray(scores)))

    checks = [
        ("flagship BiLSTM decode", flagship_decode),
        ("flagship grad step", flagship_grad_step),
        ("CRF Viterbi", crf_viterbi),
        ("blocked local attention", blocked_local_attention),
        ("flash attention fwd+bwd (TPU training default)", flash_attention_grad),
        ("flash biased attention fwd+bwd (T5 family)", flash_biased_attention_grad),
        ("flash dropped attention fwd+bwd (probs dropout)", flash_dropped_attention_grad),
        ("pallas local attention kernel", pallas_kernel),
        ("pallas fused instance-norm+gelu kernel", pallas_norm_kernel),
        ("CRDNN VAD posteriors", crdnn_vad_posteriors),
        ("prosodic/MFCC front-end", prosodic_frontend),
        ("wav2vec2 forward", wav2vec2_forward),
        ("transformer decode", transformer_decode),
    ]
    for name, fn in checks:
        ok = _check(name, fn) and ok
    print("SMOKE", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
