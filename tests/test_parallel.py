"""Sharded training on the 8-device CPU mesh: correctness vs single-device."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build
from multimodaltopicsegmentation_tpu.parallel.mesh import make_mesh, param_shardings
from multimodaltopicsegmentation_tpu.parallel.train_step import (
    make_sharded_decode,
    make_sharded_train_step,
)
from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

pytestmark = pytest.mark.slow  # shard_map compile-heavy (dryrun entrypoint ~2 min)


@pytest.fixture(scope="module")
def setup():
    cfg = TaggerConfig(embedding_dim=16, hidden_dim=8, num_layers=2, loss_fn="FocalLoss")
    arch = build("BiLSTM", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, L = 8, 24
    x = jnp.asarray(rng.standard_normal((B, L, 16)), jnp.float32)
    tags = jnp.asarray((rng.random((B, L)) < 0.15).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), L, np.int32))
    return cfg, arch, params, x, tags, lengths


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("model_parallel", [1, 2, 4])
def test_sharded_step_matches_single_device(setup, model_parallel):
    cfg, arch, params, x, tags, lengths = setup
    tx = make_optimizer("Adam", 1e-3)

    # single-device reference
    def step(params, opt_state, src, lengths, tags, rng):
        import optax

        def loss_fn(p):
            return arch.loss(p, src, lengths, tags, rng=rng)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ref_params = jax.tree.map(lambda a: a.copy(), params)
    ref_state = tx.init(ref_params)
    ref_params, _, ref_loss = jax.jit(step)(
        ref_params, ref_state, x, lengths, tags, jax.random.PRNGKey(1)
    )

    mesh = make_mesh(8, model_parallel=model_parallel)
    sharded_step, place = make_sharded_train_step(arch, tx, mesh, params)
    p = place(jax.tree.map(lambda a: a.copy(), params))
    opt_state = tx.init(p)
    with mesh:
        p, opt_state, loss = sharded_step(
            p, opt_state, x, lengths, tags, jax.random.PRNGKey(1), {}
        )

    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)
    flat_ref = jax.tree.leaves(ref_params)
    flat_new = jax.tree.leaves(p)
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_decode(setup):
    cfg, arch, params, x, tags, lengths = setup
    mesh = make_mesh(8, model_parallel=2)
    decode = make_sharded_decode(arch, mesh, params, threshold=0.5)
    with mesh:
        scores, pred = decode(params, x, lengths)
    ref_scores, ref_pred = arch.decode(params, x, lengths, 0.5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref_pred))


def test_dryrun_multichip_entrypoint(monkeypatch):
    import __graft_entry__ as g

    # the Gloo cluster is covered by tests/test_multihost.py; skipping the
    # dryrun's smoke here saves ~60 s per invocation on this 1-CPU host
    monkeypatch.setenv("MTS_DRYRUN_MULTIHOST", "0")
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
