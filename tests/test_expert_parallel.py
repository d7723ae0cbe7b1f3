"""Expert parallelism: sharded domain towers == dense SwitchBiLSTM.

The routing is a hard domain flag, so the masked-psum combine must
reproduce the dense jnp.where selection exactly — scores, loss, decode and
parameter gradients all match on the CPU mesh (conftest).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build
from multimodaltopicsegmentation_tpu.parallel.expert import (
    expert_sharded_switch_decode,
    expert_sharded_switch_loss,
    expert_sharded_switch_scores,
    make_expert_mesh,
)

pytestmark = pytest.mark.slow  # expert shard_map compiles dominate the suite


def _setup(loss_fn="FocalLoss", B=6, L=12, D=8):
    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=10, num_layers=2, loss_fn=loss_fn,
        switch="lstm",
    )
    model = build("SwitchBiLSTM", cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    lengths = jnp.asarray([L, L - 3, 4, L, 7, 2][:B], jnp.int32)
    domains = jnp.asarray([1, 0, 0, 1, 1, 0][:B], jnp.int32)
    tags = jnp.asarray((rng.random((B, L)) < 0.25).astype(np.float32))
    return model, params, x, lengths, domains, tags


@pytest.mark.parametrize("loss_fn", ["FocalLoss", "CrossEntropy"])
def test_expert_scores_and_decode_match_dense(loss_fn):
    """Scores AND threshold decode in one pass (decode = scores +
    head_decode, so one sharded program covers both)."""
    model, params, x, lengths, domains, _ = _setup(loss_fn)
    mesh = make_expert_mesh()
    ref_scores, ref_tags = model.decode(params, x, lengths, domains, 0.5)
    got_scores, got_tags = expert_sharded_switch_decode(
        mesh, model, params, x, lengths, domains, 0.5
    )
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(ref_scores), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got_tags), np.asarray(ref_tags))


def test_expert_loss_and_grads_match_dense():
    model, params, x, lengths, domains, tags = _setup()
    mesh = make_expert_mesh()

    ref_loss, ref_g = jax.value_and_grad(
        lambda p: model.loss(p, x, lengths, tags, domains)
    )(params)
    ep_loss, ep_g = jax.value_and_grad(
        lambda p: expert_sharded_switch_loss(
            mesh, model, p, x, lengths, tags, domains
        )
    )(params)

    np.testing.assert_allclose(float(ep_loss), float(ref_loss), atol=1e-6, rtol=1e-6)
    assert jax.tree.structure(ref_g) == jax.tree.structure(ep_g)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(ep_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_expert_rejects_dense_switch_mode():
    cfg = TaggerConfig(embedding_dim=8, hidden_dim=10, num_layers=1,
                       loss_fn="FocalLoss", switch="dense")
    model = build("SwitchBiLSTM", cfg)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_expert_mesh()
    with pytest.raises(ValueError, match="switch='lstm'"):
        expert_sharded_switch_scores(
            mesh, model, params, jnp.zeros((2, 4, 8)), jnp.asarray([4, 4]),
            jnp.asarray([0, 1]),
        )


def test_expert_jitted_train_step_runs():
    model, params, x, lengths, domains, tags = _setup()
    mesh = make_expert_mesh()
    f = jax.jit(
        jax.value_and_grad(
            lambda p: expert_sharded_switch_loss(
                mesh, model, p, x, lengths, tags, domains,
                rng=jax.random.PRNGKey(1),
            )
        )
    )
    loss, grads = f(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
