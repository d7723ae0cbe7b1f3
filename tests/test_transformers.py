"""Transformer-family taggers: shapes, finite losses, gradient flow, decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build
from multimodaltopicsegmentation_tpu.models.transformers import pyramidal_windows


def _data(B=2, L=48, D=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.15).astype(np.float32))
    lengths = jnp.asarray(np.array([L, L - 9], np.int32))
    return x, tags, lengths


def test_pyramidal_windows():
    assert pyramidal_windows(4, 3) == [12, 8, 4]
    # odd products get forced even
    assert pyramidal_windows(3, 2) == [6, 4]


@pytest.mark.parametrize(
    "arch,loss_fn",
    [
        ("Transformer", "FocalLoss"),
        ("Transformer", "CrossEntropy"),
        ("RecurrentLongT5", "FocalLoss"),
        ("BiLSTMRestrictedMHA", "FocalLoss"),
        ("Transformer-CRF", "CrossEntropy"),
    ],
)
def test_arch_trains_and_decodes(arch, loss_fn):
    cfg = TaggerConfig(
        embedding_dim=16, hidden_dim=16, num_layers=2, nheads=2,
        attention_window=4, loss_fn=loss_fn,
    )
    model = build(arch, cfg)
    params = model.init(jax.random.PRNGKey(0))
    x, tags, lengths = _data()

    # ONE jitted value_and_grad program covers loss finiteness, gradient
    # flow, and end-to-end jit-compilability (this test used to compile
    # three programs — unjitted loss, unjitted grad, jitted loss — and was
    # the fast tier's #2 cost at 32 s/param; round-5 latency pass)
    loss, g = jax.jit(jax.value_and_grad(
        lambda p: model.loss(p, x, lengths, tags, rng=jax.random.PRNGKey(1))
    ))(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert gnorm > 0

    if arch.endswith("CRF"):
        scores, pred = model.decode(params, x, lengths)
    else:
        scores, pred = model.decode(params, x, lengths, 0.5)
    assert pred.shape == (2, 48)
    assert pred.dtype == bool


def test_transformer_learns_boundaries():
    """A 1-layer local transformer should overfit an easy boundary pattern."""
    import optax

    cfg = TaggerConfig(
        embedding_dim=8, hidden_dim=32, num_layers=1, nheads=2,
        attention_window=4, loss_fn="FocalLoss",
    )
    model = build("Transformer", cfg)
    rng = np.random.default_rng(0)
    B, L = 4, 32
    tags = np.zeros((B, L), np.float32)
    x = np.zeros((B, L, 8), np.float32)
    for b in range(B):
        cut = int(rng.integers(8, 24))
        x[b, :cut] = 1.0 + 0.1 * rng.standard_normal((cut, 8))
        x[b, cut:] = -1.0 + 0.1 * rng.standard_normal((L - cut, 8))
        tags[b, cut - 1] = 1
    lengths = jnp.full((B,), L, jnp.int32)
    x, tags = jnp.asarray(x), jnp.asarray(tags)

    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda p: model.loss(p, x, lengths, tags))(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(150):
        params, state, loss = step(params, state)
    _, pred = model.decode(params, x, lengths, 0.5)
    acc = float(jnp.mean((pred == (tags > 0)).astype(jnp.float32)))
    assert acc > 0.97, f"accuracy {acc}, loss {float(loss)}"


# ---------------------------------------------------------------------------
# Auto-remat policy (trace-time store-vs-recompute choice)
# ---------------------------------------------------------------------------


class _FakeTpu:
    platform = "tpu"


def _on_fake_tpu(monkeypatch, flash=True):
    from multimodaltopicsegmentation_tpu.ops import attention as attn

    monkeypatch.delenv("MTS_REMAT", raising=False)
    monkeypatch.setattr(jax, "devices", lambda: [_FakeTpu()])
    monkeypatch.setattr(attn, "_flash_default", lambda: flash)


def test_auto_remat_env_override(monkeypatch):
    from multimodaltopicsegmentation_tpu.models.transformers import _auto_remat

    monkeypatch.setenv("MTS_REMAT", "0")
    assert _auto_remat(64, 8192, 4096, 16384, 32, [None] * 48) is False
    monkeypatch.setenv("MTS_REMAT", "1")
    assert _auto_remat(1, 8, 4, 4, 1, [4]) is True


def test_auto_remat_stays_on_off_tpu(monkeypatch):
    from multimodaltopicsegmentation_tpu.models.transformers import _auto_remat

    monkeypatch.delenv("MTS_REMAT", raising=False)
    # CPU suite: jax.devices() is the real (cpu) backend
    assert _auto_remat(1, 8, 4, 4, 1, [4]) is True


def test_auto_remat_banded_path_keeps_remat(monkeypatch):
    from multimodaltopicsegmentation_tpu.models.transformers import _auto_remat

    _on_fake_tpu(monkeypatch, flash=False)
    assert _auto_remat(1, 8, 4, 4, 1, [4]) is True


def test_auto_remat_flagship_decisions(monkeypatch):
    from multimodaltopicsegmentation_tpu.models.transformers import _auto_remat

    _on_fake_tpu(monkeypatch)
    # flagship Longformer 10x3600 D=768 d_ff=256 windows [240,120]:
    # estimate 2.8 GB <= 4 GB budget -> store (measured 50.1 vs 67.6 ms)
    assert _auto_remat(10, 3600, 768, 256, 8, [240, 120]) is False
    # deeper stacks push the estimate (1.40 GB/layer) past the 4 GiB
    # budget -> recompute
    assert _auto_remat(10, 3600, 768, 256, 8, [240, 180, 120, 60]) is True
    # dense layers at long length: stored softmax weights dominate -> recompute
    assert _auto_remat(10, 3600, 768, 256, 8, [None, None]) is True
    # ... but dense at short length fits fine -> store
    assert _auto_remat(10, 512, 768, 256, 8, [None, None]) is False
    # RecurrentLongT5 flagship: 1-layer stacks sharing the budget 2 ways
    assert _auto_remat(10, 3600, 512, 512, 8, [240], share=2) is False
    assert _auto_remat(10, 3600, 512, 512, 8, [240], share=8) is True


def test_remat_choice_preserves_numerics():
    """Forced remat on/off give identical losses and gradients (CPU)."""
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=2, nheads=2,
                       attention_window=4, loss_fn="FocalLoss")
    x, tags, lengths = _data()
    losses, grads = [], []
    for forced in (True, False):
        model = build("Transformer", cfg)
        model.encoder.remat = forced
        params = model.init(jax.random.PRNGKey(0))
        loss, g = jax.value_and_grad(
            lambda p: model.loss(p, x, lengths, tags))(params)
        losses.append(float(loss))
        grads.append(g)
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        grads[0], grads[1])


def test_auto_remat_keeps_remat_under_attend_fn(monkeypatch):
    """The sequence-parallel halo attend_fn runs the banded XLA path whose
    stored scores the estimate doesn't model — auto must keep remat."""
    from multimodaltopicsegmentation_tpu.models.transformers import _BertStyleEncoder

    _on_fake_tpu(monkeypatch)
    enc = _BertStyleEncoder(768, 8, 2, 256, [240, 120], 0.0)
    assert enc._use_remat(10, 3600) is False           # flash path: store
    assert enc._use_remat(10, 3600, object()) is True  # substituted op: remat
    monkeypatch.setenv("MTS_REMAT", "0")
    assert enc._use_remat(10, 3600, object()) is False  # explicit force wins


# ---------------------------------------------------------------------------
# Train-time dropout parity (reference HF configs + RNN-wrapper dropouts)
# ---------------------------------------------------------------------------


def _loss_of(arch, cfg, key, **kw):
    model = build(arch, cfg, **kw) if kw else build(arch, cfg)
    params = model.init(jax.random.PRNGKey(0))
    x, tags, lengths = _data()
    return model, params, float(
        model.loss(params, x, lengths, tags, rng=jax.random.PRNGKey(key)))


@pytest.mark.parametrize("arch,field", [
    ("Transformer", "dropout_out"),     # attention-probs dropout (HF :92)
    ("Transformer", "dropout_in"),      # hidden + embeddings dropout
    ("RecurrentLongT5", "dropout_in"),  # RNN-wrapper + T5 dropouts
    ("RecurrentLongT5", "dropout_out"),  # RNN-wrapper output dropout
    ("BiLSTMRestrictedMHA", "dropout_in"),
    ("BiLSTMRestrictedMHA", "dropout_out"),
])
def test_train_dropout_reaches_the_loss(arch, field):
    base_cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=2,
                            nheads=2, attention_window=4, loss_fn="FocalLoss")
    import dataclasses

    drop_cfg = dataclasses.replace(base_cfg, **{field: 0.5})
    _, _, l0 = _loss_of(arch, base_cfg, key=7)
    _, _, l1 = _loss_of(arch, drop_cfg, key=7)
    _, _, l2 = _loss_of(arch, drop_cfg, key=8)
    assert l0 != l1, f"{field} inert in {arch} training"
    assert l1 != l2, f"{field} not rng-driven in {arch}"


def test_eval_decode_invariant_to_dropout():
    import dataclasses

    base_cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=2,
                            nheads=2, attention_window=4, loss_fn="FocalLoss")
    drop_cfg = dataclasses.replace(base_cfg, dropout_in=0.5, dropout_out=0.5)
    x, _, lengths = _data()
    for arch in ("Transformer", "RecurrentLongT5", "BiLSTMRestrictedMHA"):
        m0 = build(arch, base_cfg)
        m1 = build(arch, drop_cfg)
        params = m0.init(jax.random.PRNGKey(0))
        s0, p0 = m0.decode(params, x, lengths, 0.5)
        s1, p1 = m1.decode(params, x, lengths, 0.5)
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_dense_transformer_trains_with_default_attention_dropout():
    """The reference's Classic path never overrides HF BertConfig's default
    attention_probs_dropout_prob=0.1, so the dense variant regularizes at
    0.1 regardless of flags (RestrictedTransformerLayer.py:27-35)."""
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=1,
                       nheads=2, attention_window=0, loss_fn="FocalLoss")
    model = build("Transformer", cfg)
    assert model.encoder.windows is None and model.encoder.attn_drop == 0.1
    x, tags, lengths = _data()
    params = model.init(jax.random.PRNGKey(0))
    l1 = float(model.loss(params, x, lengths, tags, rng=jax.random.PRNGKey(1)))
    l2 = float(model.loss(params, x, lengths, tags, rng=jax.random.PRNGKey(2)))
    assert l1 != l2  # rng-driven even with dropout flags at 0


def test_noffn_block_trains_with_default_attention_dropout():
    """The vendored noffn layer never overrides HF LongformerConfig's
    attention_probs_dropout_prob, so RecurrentLongformer trains with probs
    dropout 0.1 regardless of flags — replicated (train-only)."""
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=16, num_layers=2,
                       nheads=2, attention_window=4, loss_fn="FocalLoss")
    model = build("BiLSTMRestrictedMHA", cfg)
    x, tags, lengths = _data()
    params = model.init(jax.random.PRNGKey(0))
    l1 = float(model.loss(params, x, lengths, tags, rng=jax.random.PRNGKey(1)))
    l2 = float(model.loss(params, x, lengths, tags, rng=jax.random.PRNGKey(2)))
    assert l1 != l2
    # decode stays deterministic
    _, p1 = model.decode(params, x, lengths, 0.5)
    _, p2 = model.decode(params, x, lengths, 0.5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_auto_remat_mask_estimate_tracks_flash_quantum(monkeypatch):
    """The dropout-mask transient estimate must mirror the kernel's actual
    block geometry (ops/pallas_attention._flash_geometry), including the
    MTS_FLASH_BLOCK_QUANT widening knob — a hardcoded quantum would
    underestimate HBM near the budget edge and store un-fittable programs."""
    from multimodaltopicsegmentation_tpu.models.transformers import _auto_remat

    _on_fake_tpu(monkeypatch)
    monkeypatch.delenv("MTS_FLASH_BLOCK_QUANT", raising=False)
    # flagship + active probs dropout: mask transient 0.41 GB, total 3.2 GB
    # of the 4 GiB budget -> store
    assert _auto_remat(10, 3600, 768, 256, 8, [240, 120], attn_drop=0.1) is False
    # widening the flash block quantum inflates the REAL mask ([B*H,
    # nb*block, 3*block] scales with block); the estimate must follow
    monkeypatch.setenv("MTS_FLASH_BLOCK_QUANT", "2048")
    assert _auto_remat(10, 3600, 768, 256, 8, [240, 120], attn_drop=0.1) is True
