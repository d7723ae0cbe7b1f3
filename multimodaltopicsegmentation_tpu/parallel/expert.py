"""Expert parallelism for the domain-adaptive tagger.

The reference's SwitchBiLSTM (/root/reference/models/CRF.py:1046-1270) is a
two-expert mixture routed by a hard per-document domain flag (digit-named
files = RadioNews, else NonNews — EncoderDataset.py:36-44). The in-model
implementation (models/taggers.py SwitchBiLSTM) runs BOTH expert towers on
the full batch and selects per sample — simple and jit-friendly, but 2x the
recurrent FLOPs on one device.

This module shards the EXPERT axis over the mesh instead: each device group
holds exactly one domain tower's parameters and runs only that tower; the
routing mask zeroes the samples that belong to the other expert and a psum
over the 'expert' axis combines the towers' outputs. Routing is exact (no
capacity factor, no token dropping — the reference's domain split is hard,
so masked-psum combine reproduces the dense jnp.where selection
bit-for-bit), and each device executes half the recurrent work.

Gradients flow through the psum (its transpose is broadcast), so the same
program trains expert-sharded: each expert's gradient lands only on its own
shard's parameters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


from . import shard_map as _shard_map

N_EXPERTS = 2  # the reference's domain flag is binary


def make_expert_mesh(devices=None) -> Mesh:
    """('expert',) mesh of size 2 over the first two devices."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= N_EXPERTS, f"need {N_EXPERTS} devices"
    return Mesh(devices[:N_EXPERTS], ("expert",))


def expert_sharded_switch_scores(
    mesh: Mesh,
    model,
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    domains: jnp.ndarray,
    axis: str = "expert",
    train: bool = False,
    rng=None,
) -> jnp.ndarray:
    """SwitchBiLSTM.scores with the two LSTM towers sharded over `axis`.

    Only the 'lstm' switch mode has expert-sized towers worth sharding (the
    'dense' mode switches two tiny heads over one shared trunk).
    """
    from ..models.base import linear
    from ..models.taggers import rnn_stack_apply

    cfg = model.cfg
    if cfg.switch != "lstm":
        raise ValueError(
            f"expert sharding applies to switch='lstm' towers, got {cfg.switch!r}"
        )
    assert mesh.shape[axis] == N_EXPERTS, mesh.shape

    # stack the two towers: expert 0 = rnn1 (selected when domain == 1,
    # matching the dense path's jnp.where(dom, h1, h2))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]), params["rnn1"], params["rnn2"]
    )

    def spmd(local, x, lengths, domains):
        lp = jax.tree.map(lambda a: a[0], local)  # my expert's tower
        e = lax.axis_index(axis)
        key = None if rng is None else jax.random.fold_in(rng, e)
        h = rnn_stack_apply(lp, cfg, x, lengths, train, key)
        dom = domains.astype(x.dtype)
        sel = jnp.where(e == 0, dom, 1.0 - dom)  # [B]
        return lax.psum(h * sel[:, None, None], axis)

    # check_vma=False: the scan LSTM allocates its zero initial carry
    # internally, which the varying-manual-axes checker flags against the
    # expert-varying weights; the psum above still returns a replicated
    # result, which is what out_specs=P() needs.
    h = _shard_map()(
        spmd,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked, x, lengths, domains)
    return linear(params["cls"], h)


def expert_sharded_switch_loss(
    mesh: Mesh,
    model,
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    tags: jnp.ndarray,
    domains: jnp.ndarray,
    axis: str = "expert",
    rng=None,
    train: bool = True,
) -> jnp.ndarray:
    from ..models.base import head_loss

    logits = expert_sharded_switch_scores(
        mesh, model, params, x, lengths, domains, axis=axis, train=train, rng=rng
    )
    return head_loss(model.cfg, logits, lengths, tags)


def expert_sharded_switch_decode(
    mesh: Mesh,
    model,
    params: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    domains: jnp.ndarray,
    threshold: float,
    axis: str = "expert",
):
    from ..models.base import head_decode

    logits = expert_sharded_switch_scores(
        mesh, model, params, x, lengths, domains, axis=axis
    )
    return logits, head_decode(model.cfg, logits, threshold)
