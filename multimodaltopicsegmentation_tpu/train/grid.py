"""Lockstep hyperparameter-grid training: every dropout configuration in one
vmapped program.

The reference's grid search trains its 9 configurations sequentially
(/root/reference/train_fit.py:169-296); on the paper's grids only the
dropout-in/out rates vary (hidden units and layer counts are singletons —
e.g. RadioNews-SBBC/run_radionews_unimodal.sh: `-huss 256 -nlss 2
-diss 0 0.2 0.5 -doss 0 0.2 0.5`), so every configuration shares parameter
shapes and the whole grid can train as ONE jitted step vmapped over a
config axis. The MXU sees G-fold-larger matmuls instead of G sequential
underutilized programs.

Per-config numerics match a serial `Trainer` run with the same seed
EXACTLY: the PRNG stream is shared (the serial trainer reseeds identically
per configuration), dropout varies through traced rates, learning-rate
plateau scheduling and early stopping are tracked per config on host (a
stopped config keeps computing in lockstep but its best checkpoint is
frozen, which is what stopping at that epoch produces serially).
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import registry
from ..models.base import TaggerConfig
from . import checkpoints as ckpt_lib
from .loop import PlateauScheduler, _set_lr, batches_to_device, make_optimizer


class GridTrainer:
    """Train G (dropout_in, dropout_out) configurations of one architecture
    in lockstep. Produces, per configuration, the same artifacts a serial
    `Trainer` would: a history and a best-checkpoint path (in a
    config-unique subdirectory of `check_dir`)."""

    # architectures whose parameter shapes are dropout-invariant AND whose
    # loss threads traced dropout rates (BiLSTM, BiLSTMLateFusion) or has no
    # dropout at all (SimpleBiLSTM — the reference's class has none either,
    # models/CRF.py:895-977, so its dropout "grid" degenerates to identical
    # configs exactly as it does serially)
    SUPPORTED = ("BiLSTM", "BiLSTMLateFusion", "SimpleBiLSTM")

    def __init__(
        self,
        architecture: str,
        cfg: TaggerConfig,
        grid: List[Tuple[float, float]],
        lr: float = 1e-3,
        optimizer: str = "Adam",
        max_epochs: int = 100,
        patience: int = 20,
        no_early_stop: bool = False,
        monitor: str = "val_loss",
        check_dir: str = "checkpoints",
        seed: int = 42,
        gradient_clipping: float = 0.0,
        detect_anomaly: Optional[bool] = None,
        tag: str = "",
        mesh=None,
    ):
        if architecture not in self.SUPPORTED:
            raise ValueError(
                f"lockstep grid training supports {self.SUPPORTED}, not {architecture!r}"
            )
        self.arch_name = architecture
        self.arch = registry.build(architecture, cfg)
        self.double = registry.is_double_input(architecture)
        self.cfg = cfg
        self.grid = [(float(d), float(o)) for d, o in grid]
        self.lr = lr
        self.optimizer_name = optimizer
        self.max_epochs = max_epochs
        self.patience = patience
        self.no_early_stop = no_early_stop
        self.monitor = monitor
        self.check_dir = check_dir
        self.seed = seed
        self.clip = gradient_clipping
        self.tag = tag
        if detect_anomaly is None:
            detect_anomaly = os.environ.get("MTS_DETECT_ANOMALY", "1") != "0"
        self.detect_anomaly = detect_anomaly
        # multi-chip: the config axis is embarrassingly parallel, so it
        # shards over the mesh 'data' axis — G configs train in the
        # wall-clock of ceil(G/n) (grids that do not divide are padded
        # with a dummy repeat of the last config; its results are ignored)
        self.mesh = mesh if (mesh is not None and mesh.shape.get("data", 1) > 1) else None
        self.best_model_paths: List[Optional[str]] = [None] * len(self.grid)
        self.histories: List[list] = [[] for _ in self.grid]
        # per-config parameter snapshot taken when that config early-stops
        # (serial training would have ENDED there, so '-s_last' final params
        # must come from the stop epoch, not from the lockstep end)
        self._stop_params: List[Optional[dict]] = [None] * len(self.grid)

    def _config_dir(self, g: int) -> str:
        # `tag` disambiguates runs sharing one check_dir (e.g. per-fold
        # tags from train_fit); without it a later fold's checkpoints would
        # overwrite an earlier fold's before anything gets tested
        din, dout = self.grid[g]
        tag = f"{self.tag}_" if self.tag else ""
        return os.path.join(self.check_dir, f"grid_{tag}di{din:g}_do{dout:g}")

    def _cfg_for(self, g: int) -> TaggerConfig:
        din, dout = self.grid[g]
        return dataclasses.replace(self.cfg, dropout_in=din, dropout_out=dout)

    def fit(self, train_batches: List[dict], valid_batches: Optional[List[dict]] = None):
        G = len(self.grid)
        # pad the config axis to the mesh 'data' multiple (dummy repeats of
        # the last config; the host loops below only ever read rows < G)
        Gp = G
        if self.mesh is not None:
            n = self.mesh.shape["data"]
            Gp = -(-G // n) * n
        pad_grid = self.grid + [self.grid[-1]] * (Gp - G)
        arch = self.arch
        rng = jax.random.PRNGKey(self.seed)
        rng, k_init = jax.random.split(rng)
        params0 = arch.init(k_init)  # identical init per config, like serial
        params = jax.tree.map(lambda a: jnp.stack([a] * Gp), params0)
        tx = make_optimizer(self.optimizer_name, self.lr, self.clip)
        rates = jnp.asarray(pad_grid, jnp.float32)  # [Gp, 2]

        arch_name = self.arch_name

        def arch_loss(q, x, lengths, tags, k, rate, x2):
            if arch_name == "SimpleBiLSTM":  # no dropout in this architecture
                return arch.loss(q, x, lengths, tags, rng=k)
            if self.double:
                return arch.loss(
                    q, x, lengths, tags, rng=k, x2=x2,
                    dropout_rates=(rate[0], rate[1]),
                )
            return arch.loss(
                q, x, lengths, tags, rng=k, dropout_rates=(rate[0], rate[1])
            )

        def one_step(p, s, rate, x, lengths, tags, k, x2):
            def loss_fn(q):
                return arch_loss(q, x, lengths, tags, k, rate, x2)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        jit_kw = {}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            g_shard = jax.tree.map(
                lambda _: NamedSharding(self.mesh, P("data")), params
            )
            rep = NamedSharding(self.mesh, P())
            params = jax.device_put(params, g_shard)
            rates = jax.device_put(rates, NamedSharding(self.mesh, P("data")))
            jit_kw = dict(
                in_shardings=(g_shard, None, NamedSharding(self.mesh, P("data")),
                              rep, rep, rep, rep, rep),
                out_shardings=(g_shard, None, None),
            )
        opt_state = jax.vmap(tx.init)(params)  # inherits params' shardings
        step = jax.jit(
            jax.vmap(one_step, in_axes=(0, 0, 0, None, None, None, None, None)),
            donate_argnums=(0, 1),
            **jit_kw,
        )
        # validation is deterministic (no dropout) so rates do not enter
        eval_kw = {}
        if self.mesh is not None:
            eval_kw = dict(in_shardings=(jit_kw["in_shardings"][0],) + (rep,) * 4)

        def eval_one(p, x, l, t, x2):
            if self.double:
                return arch.loss(p, x, l, t, rng=None, x2=x2)
            return arch.loss(p, x, l, t, rng=None)

        eval_loss = jax.jit(
            jax.vmap(eval_one, in_axes=(0, None, None, None, None)),
            **eval_kw,
        )

        # upload batches once (see loop.batches_to_device for the measured
        # rationale); under a mesh they replicate — the CONFIG axis is the
        # sharded one, not the document axis
        train_batches = batches_to_device(train_batches, self.mesh, replicate=True)
        if valid_batches:
            valid_batches = batches_to_device(valid_batches, self.mesh, replicate=True)

        scheds = [PlateauScheduler(self.lr) for _ in range(G)]
        lr_vec = np.full((Gp,), self.lr, np.float32)
        best = np.full((G,), np.inf)
        bad = np.zeros((G,), int)
        stopped = np.zeros((G,), bool)
        best_snapshots = [None] * G
        best_extras = [{}] * G
        for g in range(G):
            os.makedirs(self._config_dir(g), exist_ok=True)

        # written in `finally`: a mid-training crash still leaves every
        # configuration's top-1 checkpoint on disk
        try:
            for epoch in range(self.max_epochs):
                epoch_losses = []
                for bi, batch in enumerate(train_batches):
                    rng, k = jax.random.split(rng)
                    src = jnp.asarray(batch["src_tokens"])
                    # unused (and DCE'd) unless the architecture is double-
                    # input; reusing src keeps the jit signature stable
                    x2 = jnp.asarray(batch["src_tokens2"]) if self.double else src
                    params, opt_state, loss = step(
                        params,
                        opt_state,
                        rates,
                        src,
                        jnp.asarray(batch["src_lengths"]),
                        jnp.asarray(batch["tgt_tokens"]),
                        k,
                        x2,
                    )
                    epoch_losses.append(loss)
                # [n_b, G]; padded dummy configs (mesh rounding) are dropped.
                # One stacked transfer instead of a ~30 ms tunnel round trip
                # per batch (same batching as Trainer.fit)
                batch_losses = np.asarray(jnp.stack(epoch_losses))[:, :G]
                if self.detect_anomaly and not np.all(np.isfinite(batch_losses)):
                    b, g = map(int, np.argwhere(~np.isfinite(batch_losses))[0])
                    raise FloatingPointError(
                        f"detect_anomaly: non-finite training loss at epoch {epoch}, "
                        f"batch {b}, grid config {self.grid[g]} (set "
                        f"MTS_DETECT_ANOMALY=0 to train through it)"
                    )
                train_loss = batch_losses.mean(axis=0)  # [G]

                if valid_batches:
                    vals, weights = [], []
                    for batch in valid_batches:
                        src = jnp.asarray(batch["src_tokens"])
                        x2 = (
                            jnp.asarray(batch["src_tokens2"]) if self.double else src
                        )
                        l = eval_loss(
                            params,
                            src,
                            jnp.asarray(batch["src_lengths"]),
                            jnp.asarray(batch["tgt_tokens"]),
                            x2,
                        )
                        vals.append(l)
                        weights.append(batch.get("n_real", len(batch["src_lengths"])))
                    # drain after all evals are queued (one stacked transfer)
                    val_loss = np.average(
                        np.asarray(jnp.stack(vals)), axis=0, weights=weights
                    )[:G]
                else:
                    val_loss = None

                monitored = (
                    train_loss
                    if (self.monitor == "training_loss" or val_loss is None)
                    else val_loss
                )
                for g in range(G):
                    if stopped[g]:
                        continue  # a serial run would have ended at the stop epoch
                    self.histories[g].append(
                        {
                            "epoch": epoch,
                            "training_loss": float(train_loss[g]),
                            "val_loss": None if val_loss is None else float(val_loss[g]),
                        }
                    )

                for g in range(G):
                    if stopped[g]:
                        continue
                    m = float(monitored[g])
                    if not np.isfinite(m):
                        m = float("inf")
                    if m < best[g] or self.best_model_paths[g] is None:
                        best[g] = m
                        bad[g] = 0
                        # device-side snapshot; the disk write happens once at
                        # fit end (see Trainer.fit for the measured rationale)
                        best_snapshots[g] = jax.tree.map(
                            lambda a, g=g: a[g].copy(), params
                        )
                        fname_val = m if np.isfinite(m) else 9999.9999
                        self.best_model_paths[g] = os.path.join(
                            self._config_dir(g), ckpt_lib.checkpoint_name(epoch, fname_val, 0.5)
                        )
                        best_extras[g] = {"epoch": epoch, "monitored": m, "grid": self.grid[g]}
                    else:
                        bad[g] += 1
                        if not self.no_early_stop and bad[g] >= self.patience:
                            stopped[g] = True
                            self._stop_params[g] = jax.tree.map(
                                lambda a, g=g: a[g].copy(), params
                            )
                    lr_vec[g] = scheds[g].step(float(monitored[g]))
                opt_state = _set_lr(opt_state, lr_vec)  # vector of per-config rates

                if stopped.all() and not self.no_early_stop:
                    break

        finally:
            for g in range(G):
                if best_snapshots[g] is not None:
                    ckpt_lib.save(
                        self.best_model_paths[g],
                        jax.tree.map(np.asarray, best_snapshots[g]),
                        self._cfg_for(g),
                        self.arch_name,
                        extra=best_extras[g],
                    )
        self.params = params
        return params, self.histories

    def final_params(self, g: int):
        """Configuration g's final parameters: the snapshot from its own
        early-stop epoch if it stopped, else the lockstep end state."""
        if self._stop_params[g] is not None:
            return self._stop_params[g]
        return jax.tree.map(lambda a: np.asarray(a[g]), self.params)

    def save_final(self, g: int) -> str:
        """-s_last / no_validation artifact for configuration g."""
        path = os.path.join(self._config_dir(g), "final=0.500.ckpt")
        ckpt_lib.save(
            path, self.final_params(g), self._cfg_for(g), self.arch_name,
            extra={"final": True, "grid": self.grid[g]},
        )
        self.best_model_paths[g] = path
        return path
