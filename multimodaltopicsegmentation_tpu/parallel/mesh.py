"""Device mesh + sharding rules.

The reference has no distributed execution at all (single-process Lightning,
`gpus=N` without a strategy — /root/reference/train_fit.py:284-296). This
module is the TPU-native replacement layer: an ICI mesh with

- `data` axis: batch (document) parallelism for training and for the
  batched predict front-end;
- `model` axis: tensor parallelism of the recurrent gate projections and
  classification head (weights sharded on the gate/output feature axis, so
  XLA turns the per-step `h @ W_hh` into a sharded matmul + all-gather over
  ICI).

Shardings are expressed as `NamedSharding` trees matched to the param pytree
by leaf path; XLA inserts all collectives (psum for DP gradients, all-gather
for TP activations). Works identically on real chips and on the CPU
`--xla_force_host_platform_device_count` emulation used by tests and the
driver dryrun.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def param_spec(path: str) -> P:
    """Partition rule for a tagger parameter, keyed on its tree path.

    Gate-stacked recurrent weights `w_ih`/`w_hh` [in, 4H] and biases [4H]
    shard the gate axis over 'model'; classifier weights shard the input
    (hidden) axis; small CRF tables replicate.
    """
    leaf = path.split("/")[-1]
    if leaf in ("w_ih", "w_hh"):
        return P(None, "model")
    if leaf in ("b", "b_ih", "b_hh"):
        return P("model")
    if leaf == "w":  # linear heads: shard the (large) input-feature axis
        return P("model", None)
    return P()


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else str(k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, f"{prefix}/{i}")
    else:
        yield prefix, tree


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree matching `params` (by structure)."""
    paths = dict(_tree_paths(params))

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: build(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in tree.items()
            }
        if isinstance(tree, (list, tuple)):
            t = [build(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return type(tree)(t)
        spec = param_spec(prefix)
        # replicate anything whose sharded axis doesn't divide evenly
        leaf = tree
        axes = spec
        for dim, name in enumerate(axes):
            if name is not None and leaf.shape[dim] % mesh.shape[name] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return build(params)


def batch_shardings(mesh: Mesh):
    """Batch arrays shard the leading (document) axis over 'data'."""
    return {
        "src_tokens": NamedSharding(mesh, P("data", None, None)),
        "tgt_tokens": NamedSharding(mesh, P("data", None)),
        "src_lengths": NamedSharding(mesh, P("data")),
        "domain": NamedSharding(mesh, P("data")),
    }


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
