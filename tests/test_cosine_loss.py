"""Segment-coherence cosine loss tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.ops.cosine_loss import cosine_segment_loss
from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build


def test_coherent_segments_low_loss():
    # two segments, each internally identical but different across -> ideal
    B, L, D = 1, 8, 4
    h = np.zeros((B, L, D), np.float32)
    h[0, :4] = [1, 0, 0, 0]
    h[0, 4:] = [0, 1, 0, 0]
    tags = np.zeros((B, L), np.float32)
    tags[0, 3] = 1
    tags[0, 7] = 1
    lengths = jnp.asarray([L])
    loss = float(cosine_segment_loss(jnp.asarray(h), lengths, jnp.asarray(tags)))
    # positives: cos=1 -> 0; negatives: cos=0 -> 0
    assert loss == pytest.approx(0.0, abs=1e-5)


def test_incoherent_segments_high_loss():
    B, L, D = 1, 8, 4
    h = np.zeros((B, L, D), np.float32)
    # same embedding everywhere -> negative pairs fully similar (cos=1)
    h[0, :] = [1, 0, 0, 0]
    tags = np.zeros((B, L), np.float32)
    tags[0, 3] = 1
    tags[0, 7] = 1
    loss = float(
        cosine_segment_loss(jnp.asarray(h), jnp.asarray([L]), jnp.asarray(tags))
    )
    # pairs: 2 perfect positives (0 each) + 1 negative at cos=1 -> mean 1/3
    assert loss == pytest.approx(1 / 3, abs=1e-5)


def test_respects_lengths_and_grads():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((2, 10, 6)), jnp.float32)
    tags = jnp.asarray((rng.random((2, 10)) < 0.3).astype(np.float32))
    lengths = jnp.asarray([10, 6])
    g = jax.grad(lambda hh: cosine_segment_loss(hh, lengths, tags))(h)
    assert np.all(np.isfinite(np.asarray(g)))
    # padded positions get no gradient
    assert np.abs(np.asarray(g)[1, 6:]).max() == 0.0


@pytest.mark.slow
def test_bilstm_with_cosine_flag_trains():
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=8, num_layers=1,
                       loss_fn="FocalLoss", cosine_loss=True)
    model = build("BiLSTM", cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    tags = jnp.asarray((rng.random((2, 12)) < 0.2).astype(np.float32))
    lengths = jnp.asarray([12, 9])
    loss = model.loss(params, x, lengths, tags)
    assert np.isfinite(float(loss))
    base_cfg = TaggerConfig(embedding_dim=8, hidden_dim=8, num_layers=1, loss_fn="FocalLoss")
    base = build("BiLSTM", base_cfg)
    base_loss = base.loss(params, x, lengths, tags)
    assert float(loss) != pytest.approx(float(base_loss))  # aux term active
    g = jax.grad(lambda p: model.loss(p, x, lengths, tags))(params)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g)) > 0
