"""Multi-host execution: DCN-side input pipeline + global-mesh assembly.

The reference has no distributed execution at all (SURVEY.md §2.2); the
TPU-native design runs model math over ICI inside each slice and uses the
data-center network only for coordination and the input pipeline. This
module is that boundary layer:

- `initialize()` wraps jax.distributed.initialize (env-driven defaults:
  MTS_COORDINATOR / MTS_NUM_PROCESSES / MTS_PROCESS_ID, falling back to
  jax's own cluster autodetection);
- `shard_documents()` deterministically round-robins the corpus so each
  host READS only its own documents;
- `global_batch()` lifts one process-local padded batch into a global
  device array sharded over the mesh 'data' axis
  (jax.make_array_from_process_local_data) — the result plugs directly
  into `make_sharded_train_step` / `make_sharded_decode`, and XLA routes
  gradient psums over ICI within the slice and DCN across slices.

Hosts must contribute EQUAL local batch shapes; pad with zero-length
documents (train.data.pad_batch pad_batch_to / Trainer._pad_batch_axis) —
every loss in the zoo ignores them, so numerics match a single-process run
on the concatenated batch exactly (tested with a 2-process Gloo cluster on
CPU in tests/test_multihost.py).
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or form) the multi-host cluster. No-op if already initialized.

    Must run before ANYTHING initializes the XLA backend, so the
    already-initialized check inspects jax's distributed global state
    directly instead of calling jax.process_count() (which would itself
    bring the backend up)."""
    if getattr(initialize, "_done", False):
        return
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.coordinator_address is not None:
            initialize._done = True
            return
    except Exception:
        pass
    coordinator_address = coordinator_address or os.environ.get("MTS_COORDINATOR")
    if num_processes is None and os.environ.get("MTS_NUM_PROCESSES"):
        num_processes = int(os.environ["MTS_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MTS_PROCESS_ID"):
        process_id = int(os.environ["MTS_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    initialize._done = True


def global_mesh(model_parallel: int = 1) -> Mesh:
    """('data','model') mesh over every device in the cluster (all hosts)."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    return Mesh(devices.reshape(n // model_parallel, model_parallel), ("data", "model"))


def shard_documents(docs: List, process_id: Optional[int] = None,
                    num_processes: Optional[int] = None) -> List:
    """Round-robin corpus split: host p keeps docs[p::n]. Deterministic in
    the document order every host derives identically (sorted listdir)."""
    p = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return docs[p::n]


_BATCH_SPECS = {
    "src_tokens": P("data", None, None),
    "src_tokens2": P("data", None, None),
    "tgt_tokens": P("data", None),
    "src_lengths": P("data"),
    "domain": P("data"),
}


def global_batch(local_batch: dict, mesh: Mesh) -> dict:
    """Process-local padded batch -> globally sharded arrays.

    Every host passes its OWN [B_local, ...] arrays (identical shapes across
    hosts); the result behaves as one [B_local * n_proc, ...] batch sharded
    over 'data'. Non-array entries (ids, n_real) stay process-local.
    """
    n_proc = jax.process_count()
    out = dict(local_batch)
    for key, spec in _BATCH_SPECS.items():
        if key not in local_batch or not hasattr(local_batch[key], "shape"):
            continue
        arr = np.asarray(local_batch[key])
        global_shape = (arr.shape[0] * n_proc,) + arr.shape[1:]
        out[key] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr, global_shape
        )
    return out
