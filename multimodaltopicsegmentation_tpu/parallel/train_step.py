"""pjit-style sharded training step.

One jitted function = forward + backward + optimizer update, with

- batch sharded over the mesh 'data' axis (document parallelism),
- gate/head weights sharded over 'model' (tensor parallelism),
- gradient reduction and activation gathers inserted by XLA as ICI
  collectives (no hand-written NCCL analogue, per SURVEY.md §2.2).

The same function runs single-device (trivial mesh) and multi-chip.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh

from .mesh import batch_shardings, param_shardings, replicated


def make_sharded_train_step(arch, tx, mesh: Mesh, params, extra_kind: str = "") -> Callable:
    """Returns (step_fn, place_params) for data+tensor-parallel training.

    `extra_kind` selects the architecture's extra input: '' (none),
    'domain' (SwitchBiLSTM per-doc domain ids) or 'double' (late-fusion
    second modality stream) — both shard the document axis like the batch.
    """
    p_shard = param_shardings(mesh, params)
    b_shard = batch_shardings(mesh)
    rep = replicated(mesh)

    if extra_kind == "domain":
        e_shard = {"domain": b_shard["domain"]}
    elif extra_kind == "double":
        e_shard = {"x2": b_shard["src_tokens"]}
    else:
        e_shard = {}

    def step(params, opt_state, src, lengths, tags, rng, extra):
        def loss_fn(p):
            if extra_kind == "domain":
                return arch.loss(p, src, lengths, tags, extra["domain"], rng=rng)
            if extra_kind == "double":
                return arch.loss(p, src, lengths, tags, rng=rng, x2=extra["x2"])
            return arch.loss(p, src, lengths, tags, rng=rng)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_jit = jax.jit(
        step,
        in_shardings=(
            p_shard,
            None,  # opt_state: let XLA propagate from params
            b_shard["src_tokens"],
            b_shard["src_lengths"],
            b_shard["tgt_tokens"],
            rep,
            e_shard,
        ),
        out_shardings=(p_shard, None, rep),
        donate_argnums=(0, 1),
    )

    def place_params(params):
        return jax.device_put(params, p_shard)

    return step_jit, place_params


def make_pipeline_train_step(seg, tx, pipe_mesh: Mesh, axis: str = "pipe") -> Callable:
    """Training step with the transformer layer stack pipelined over the
    ('pipe',) mesh (parallel/pipeline.py). The microbatch count is the
    batch size (microbatch = one document — maximal pipeline utilization,
    bubble (S-1)/(B+S-1)); jit caches one program per distinct batch shape,
    same as the plain step under bucketed padding.
    """
    import optax as _optax

    from .pipeline import pipeline_transformer_loss

    def step(params, opt_state, src, lengths, tags, rng, extra):
        # src.shape[0] is concrete at trace time, so jit's own per-shape
        # retrace cache handles varying batch sizes
        def loss_fn(p):
            return pipeline_transformer_loss(
                pipe_mesh, seg, p, src, lengths, tags, int(src.shape[0]),
                axis=axis, rng=rng,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = _optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_sharded_decode(arch, mesh: Mesh, params, threshold: float = 0.5) -> Callable:
    """Batched sharded inference decode (documents over 'data')."""
    p_shard = param_shardings(mesh, params)
    b_shard = batch_shardings(mesh)

    decode = jax.jit(
        lambda p, x, l: arch.decode(p, x, l, threshold),
        in_shardings=(p_shard, b_shard["src_tokens"], b_shard["src_lengths"]),
    )
    return decode
