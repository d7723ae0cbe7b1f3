"""Multi-host (DCN) story: a real 2-process Gloo cluster on CPU.

Each process hosts 2 virtual devices; the corpus is round-robined across
hosts, each host's local batch lifts into a global array over the 4-device
mesh, and one sharded train step must produce the SAME loss on both hosts —
equal to a single-process run on the concatenated batch.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
pid = int(sys.argv[1])

from multimodaltopicsegmentation_tpu.parallel import multihost
multihost.initialize(coordinator_address="127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np
import jax.numpy as jnp
from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build
from multimodaltopicsegmentation_tpu.parallel.train_step import make_sharded_train_step
from multimodaltopicsegmentation_tpu.train.loop import make_optimizer

rng = np.random.default_rng(0)
B_GLOBAL, L, D = 4, 16, 12
docs = [(rng.standard_normal((L, D)).astype(np.float32),
         (rng.random(L) < 0.2).astype(np.float32)) for _ in range(B_GLOBAL)]
mine = multihost.shard_documents(docs)
assert len(mine) == 2

local = {{
    "src_tokens": np.stack([d[0] for d in mine]),
    "tgt_tokens": np.stack([d[1] for d in mine]),
    "src_lengths": np.full((len(mine),), L, np.int32),
}}
mesh = multihost.global_mesh(model_parallel=1)
batch = multihost.global_batch(local, mesh)

cfg = TaggerConfig(embedding_dim=D, hidden_dim=8, num_layers=1, loss_fn="FocalLoss")
arch = build("BiLSTM", cfg)
params = arch.init(jax.random.PRNGKey(0))
tx = make_optimizer("Adam", 1e-3)
step, place = make_sharded_train_step(arch, tx, mesh, params)
params = place(params)
opt_state = tx.init(params)
params, opt_state, loss = step(
    params, opt_state, batch["src_tokens"], batch["src_lengths"],
    batch["tgt_tokens"], jax.random.PRNGKey(1), {{}},
)
print("LOSS", float(loss), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_matches_single_process():
    port = _free_port()
    code = _WORKER.format(repo=REPO, port=port)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    losses = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=300)
            assert p.returncode == 0, f"proc {i}:\n{out[-2000:]}"
            line = [l for l in out.splitlines() if l.startswith("LOSS ")]
            assert line, out[-2000:]
            losses.append(float(line[0].split()[1]))
    finally:
        # a failing/timed-out worker must not leave its Gloo-blocked
        # sibling running into the rest of the suite
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # single-process reference on the concatenated batch: multihost lays
    # rows out host-major (proc 0's docs then proc 1's), i.e. round-robin
    # re-gathered in [0::2] + [1::2] order
    import jax

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build

    rng = np.random.default_rng(0)
    B, L, D = 4, 16, 12
    docs = [(rng.standard_normal((L, D)).astype(np.float32),
             (rng.random(L) < 0.2).astype(np.float32)) for _ in range(B)]
    order = docs[0::2] + docs[1::2]
    x = np.stack([d[0] for d in order])
    tags = np.stack([d[1] for d in order])
    lengths = np.full((B,), L, np.int32)
    cfg = TaggerConfig(embedding_dim=D, hidden_dim=8, num_layers=1, loss_fn="FocalLoss")
    arch = build("BiLSTM", cfg)
    params = arch.init(jax.random.PRNGKey(0))
    ref = float(arch.loss(params, x, lengths, tags, rng=jax.random.PRNGKey(1)))
    assert losses[0] == pytest.approx(ref, rel=1e-5)
