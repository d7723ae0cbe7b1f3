"""Smoke + learning tests for the remaining tagger zoo."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import (
    build,
    is_crf,
    is_domain_adapt,
    is_double_input,
)


def _data(B=2, L=24, D=12, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.2).astype(np.float32))
    lengths = jnp.asarray(np.array([L, L - 7], np.int32))
    return x, tags, lengths


def test_registry_helpers():
    assert is_crf("biLSTMCRF") and is_crf("Transformer-CRF")
    assert not is_crf("BiLSTM")
    assert is_double_input("BiLSTMLateFusion")
    assert is_domain_adapt("SwitchBiLSTM")


@pytest.mark.parametrize("arch", ["SimpleBiLSTM", "MLP", "SheikhBiLSTM"])
def test_simple_archs(arch):
    cfg = TaggerConfig(embedding_dim=12, hidden_dim=8, num_layers=1, loss_fn="BinaryCrossEntropy")
    m = build(arch, cfg)
    params = m.init(jax.random.PRNGKey(0))
    x, tags, lengths = _data()
    loss = m.loss(params, x, lengths, tags)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: m.loss(p, x, lengths, tags))(params)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g)) > 0
    scores, pred = m.decode(params, x, lengths, 0.4)
    assert pred.shape == (2, 24) and pred.dtype == bool


@pytest.mark.parametrize("switch", ["dense", "lstm"])
def test_switch_bilstm(switch):
    cfg = TaggerConfig(
        embedding_dim=12, hidden_dim=8, num_layers=1, loss_fn="FocalLoss", switch=switch
    )
    m = build("SwitchBiLSTM", cfg)
    params = m.init(jax.random.PRNGKey(0))
    x, tags, lengths = _data()
    domains = jnp.asarray([1, 0])
    loss = m.loss(params, x, lengths, tags, domains)
    assert np.isfinite(float(loss))
    scores, pred = m.decode(params, x, lengths, domains, 0.4)
    assert pred.shape == (2, 24)
    # flipping a sample's domain must change its scores (routing is real)
    scores2, _ = m.decode(params, x, lengths, jnp.asarray([0, 0]), 0.4)
    assert not np.allclose(np.asarray(scores)[0], np.asarray(scores2)[0])
    np.testing.assert_allclose(np.asarray(scores)[1], np.asarray(scores2)[1], atol=1e-6)


def test_late_fusion_both_towers_contribute():
    cfg = TaggerConfig(
        embedding_dim=12, embedding_dim2=6, hidden_dim=8, num_layers=1, loss_fn="FocalLoss"
    )
    m = build("BiLSTMLateFusion", cfg)
    params = m.init(jax.random.PRNGKey(0))
    x, tags, lengths = _data()
    rng = np.random.default_rng(1)
    x2 = jnp.asarray(rng.standard_normal((2, 24, 6)), jnp.float32)
    loss = m.loss(params, x, lengths, tags, x2=x2)
    assert np.isfinite(float(loss))
    s1, _ = m.decode(params, x, lengths, 0.4, x2=x2)
    x2b = jnp.asarray(rng.standard_normal((2, 24, 6)), jnp.float32)
    s2, _ = m.decode(params, x, lengths, 0.4, x2=x2b)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_sheikh_decode_contract():
    """Sheikh scorer: coherence scores with an appended final step; low
    coherence (dissimilar forward/backward states) -> boundary."""
    cfg = TaggerConfig(embedding_dim=12, hidden_dim=8, num_layers=1)
    m = build("SheikhBiLSTM", cfg)
    params = m.init(jax.random.PRNGKey(0))
    x, tags, lengths = _data()
    scores, pred = m.decode(params, x, lengths, 0.4)
    assert scores.shape == (2, 24, 1)
    assert pred.shape == (2, 24)


def test_birnncrf_learns():
    import optax

    cfg = TaggerConfig(embedding_dim=8, hidden_dim=16, num_layers=1)
    m = build("biLSTMCRF", cfg)
    rng = np.random.default_rng(0)
    B, L = 4, 24
    x = np.zeros((B, L, 8), np.float32)
    tags = np.zeros((B, L), np.float32)
    for b in range(B):
        cut = int(rng.integers(8, 16))
        x[b, :cut] = 1.0 + 0.1 * rng.standard_normal((cut, 8))
        x[b, cut:] = -1.0 + 0.1 * rng.standard_normal((L - cut, 8))
        tags[b, cut - 1] = 1
    x, tags = jnp.asarray(x), jnp.asarray(tags)
    lengths = jnp.full((B,), L, jnp.int32)

    params = m.init(jax.random.PRNGKey(0))
    tx = optax.adam(5e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda p: m.loss(p, x, lengths, tags))(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(150):
        params, state, loss = step(params, state)
    _, pred = m.decode(params, x, lengths)
    acc = float(jnp.mean((pred == (tags > 0)).astype(jnp.float32)))
    assert acc > 0.95, f"CRF failed to learn: acc={acc} loss={float(loss)}"
