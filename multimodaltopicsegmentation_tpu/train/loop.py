"""Training/eval runtime replacing the reference's pytorch-lightning stack.

Replicates the observable behavior of TextSegmenter + Trainer
(/root/reference/models/lightning_model.py, train_fit.py:215-373):

- Adam(eps=1e-7) or SGD(momentum=.9, weight_decay=1e-4) (lightning_model.py:759-765)
- ReduceLROnPlateau(factor=.8, patience=10, rel threshold 1e-4) on the
  monitored loss (lightning_model.py:767-781) — implemented as a host-side
  multiplier injected into optax so no recompile happens on LR change
- EarlyStopping(patience, mode=min) + top-1 checkpointing keyed on
  val_loss/training_loss with the reference's filename contract
- test-time decode thresholds: self.threshold else 0.4, and the 0.0 -> 0.5
  quirk (lightning_model.py:583-585)
- per-document Pk / F1 / WindowDiff (AssertionError -> Pk fallback) or
  B-measure / WinPR depending on --metric (lightning_model.py:606-676)

Deliberate divergences (documented, not silent):
- validation loss is computed WITHOUT dropout; the reference's F.dropout
  defaults to training=True so its val loss is stochastic — deterministic
  monitoring is strictly better and changes no test-time behavior.
- batches are padded to length buckets so the jitted step compiles once per
  bucket, not once per batch shape.

The whole train step (forward + backward + optimizer) is one jitted
function; decode stays on device and only per-document metric computation
runs on host.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..eval import metrics as M
from ..models import registry
from ..models.base import TaggerConfig
from . import checkpoints as ckpt_lib

# Decode dispatches allowed in flight before the oldest result is pulled:
# deep enough to hide the ~30 ms tunnel pull behind device compute, shallow
# enough that the queued batches' [B, L, D] input buffers cannot crowd HBM
# on corpus-scale runs (each dispatched-but-unexecuted batch pins its
# inputs until it runs).
DECODE_QUEUE_DEPTH = 8


class BoundedDrain:
    """Dispatch-ahead queue shared by every decode consumer: `add` device
    results as they are dispatched; once more than DECODE_QUEUE_DEPTH are
    in flight the oldest is pulled to host (FIFO), and `finish()` drains
    the rest — device compute overlaps the pulls while resident input
    buffers stay bounded. `pull` maps one queued item to its host form."""

    def __init__(self, pull):
        self._pull = pull
        self._pending = []
        self._pulled = []

    def add(self, item):
        self._pending.append(item)
        if len(self._pending) > DECODE_QUEUE_DEPTH:
            self._pulled.append(self._pull(self._pending.pop(0)))

    def finish(self):
        while self._pending:
            self._pulled.append(self._pull(self._pending.pop(0)))
        return self._pulled


def make_optimizer(name: str, lr: float, clip: float = 0.0):
    if name == "SGD":
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(1e-4),
                optax.sgd(learning_rate, momentum=0.9),
            )
        )(learning_rate=lr)
    else:
        tx = optax.inject_hyperparams(
            lambda learning_rate: optax.adam(learning_rate, eps=1e-7)
        )(learning_rate=lr)
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def _set_lr(opt_state, lr: float):
    """Update the injected learning rate in place (works for chained state)."""

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return True
        if isinstance(state, tuple):
            return any(visit(s) for s in state)
        return False

    visit(opt_state)
    return opt_state


_DEVICE_KEYS = ("src_tokens", "tgt_tokens", "src_lengths", "domain", "src_tokens2")


def batches_to_device(batches: List[dict], mesh=None, replicate: bool = False) -> List[dict]:
    """Upload each batch's arrays ONCE before the epoch loop.

    Batches are constant across epochs; re-running jnp.asarray on host
    arrays every step re-ships them through the (remote) device link —
    measured ~265 ms per 16 MB batch on the axon tunnel vs a ~9 ms train
    step. With a mesh, arrays are placed with their training shardings
    (document axis over 'data') so the jitted step never reshards them —
    or fully replicated with `replicate=True`, for callers that shard a
    different axis (the grid trainer's config axis).
    """
    shardings = None
    if mesh is not None:
        if replicate:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            shardings = {k: rep for k in _DEVICE_KEYS}
        else:
            from ..parallel.mesh import batch_shardings

            shardings = batch_shardings(mesh)
            shardings["src_tokens2"] = shardings["src_tokens"]
    out = []
    for batch in batches:
        db = dict(batch)
        for key in _DEVICE_KEYS:
            if key in batch and hasattr(batch[key], "shape"):
                if shardings is not None:
                    db[key] = jax.device_put(np.asarray(batch[key]), shardings[key])
                else:
                    db[key] = jnp.asarray(np.asarray(batch[key]))
        out.append(db)
    return out


class PlateauScheduler:
    """torch ReduceLROnPlateau(mode=min, factor, patience, rel threshold 1e-4)."""

    def __init__(self, lr: float, factor: float = 0.8, patience: int = 10):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.best = float("inf")
        self.bad = 0

    def step(self, value: float) -> float:
        if value < self.best * (1 - 1e-4):
            self.best = value
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr *= self.factor
                self.bad = 0
        return self.lr


class Trainer:
    """Single-model fit/test driver (one fold, one hyperparameter setting)."""

    def __init__(
        self,
        architecture: str,
        cfg: TaggerConfig,
        lr: float = 1e-3,
        optimizer: str = "Adam",
        max_epochs: int = 100,
        patience: int = 20,
        no_early_stop: bool = False,
        monitor: str = "val_loss",
        check_dir: str = "checkpoints",
        seed: int = 42,
        gradient_clipping: float = 0.0,
        metric: str = "Pk",
        threshold: Optional[float] = None,
        use_end_boundary: bool = False,
        zero_baseline: bool = False,
        mesh=None,
        detect_anomaly: Optional[bool] = None,
        pipeline_stages: int = 0,
        sequence_shards: int = 0,
        expert_parallel: Optional[bool] = None,
        device_epochs: Optional[bool] = None,
    ):
        self.arch_name = architecture
        self.arch = registry.build(architecture, cfg)
        self.cfg = cfg
        self.lr = lr
        self.optimizer_name = optimizer
        self.max_epochs = max_epochs
        self.patience = patience
        self.no_early_stop = no_early_stop
        self.monitor = monitor
        self.check_dir = check_dir
        self.seed = seed
        self.clip = gradient_clipping
        self.metric = metric
        self.threshold = threshold
        self.eb = use_end_boundary
        self.zero_baseline = zero_baseline
        self.domain = registry.is_domain_adapt(architecture)
        self.double = registry.is_double_input(architecture)
        # device-resident epoch windows (train/device_fit.py): run K epochs
        # per dispatch with plateau-LR/early-stop/best-snapshot ON DEVICE.
        # Requires uniform batch shapes and the plain single-device step;
        # ragged corpora fall back to the host loop with a notice.
        if device_epochs is None:
            device_epochs = os.environ.get("MTS_DEVICE_EPOCHS", "0") == "1"
        self.device_epochs = device_epochs
        self._fit_window_cache: dict = {}
        # multi-chip: shard the train step over the ('data','model') mesh;
        # None or a 1-device mesh falls back to the plain jitted step
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        # pipeline parallelism (transformer stacks only): stages over a
        # ('pipe',) mesh instead of DP/TP — mutually exclusive with `mesh`
        self.pipe_mesh = None
        if pipeline_stages and pipeline_stages > 1:
            from ..models.transformers import TransformerSegmenter
            from ..parallel.pipeline import make_pipeline_mesh

            if not isinstance(self.arch, TransformerSegmenter):
                raise ValueError(
                    f"pipeline_stages applies to the Transformer architecture, "
                    f"got {architecture!r}"
                )
            if cfg.num_layers % pipeline_stages != 0:
                raise ValueError(
                    f"num_layers={cfg.num_layers} does not split over "
                    f"{pipeline_stages} pipeline stages"
                )
            if len(jax.devices()) < pipeline_stages:
                raise ValueError(
                    f"pipeline_stages={pipeline_stages} needs that many "
                    f"devices, have {len(jax.devices())}"
                )
            self.pipe_mesh = make_pipeline_mesh(pipeline_stages)
            self.mesh = None  # pipeline owns the devices
        # sequence (context) parallelism: shard the UNIT axis of long
        # documents over a ('seq',) mesh — transformer/local-attention only
        # (parallel/sequence.py); mutually exclusive with DP/TP and pipeline
        self.seq_mesh = None
        if sequence_shards and sequence_shards > 1:
            from jax.sharding import Mesh
            from ..models.transformers import TransformerSegmenter

            if self.pipe_mesh is not None:
                raise ValueError("sequence_shards and pipeline_stages are exclusive")
            if not isinstance(self.arch, TransformerSegmenter):
                raise ValueError(
                    f"sequence_shards applies to the Transformer architecture "
                    f"(local attention), got {architecture!r}"
                )
            if not getattr(self.arch.encoder, "windows", None):
                raise ValueError(
                    "sequence_shards needs LOCAL attention (set attention_window)"
                )
            if len(jax.devices()) < sequence_shards:
                raise ValueError(
                    f"sequence_shards={sequence_shards} needs that many "
                    f"devices, have {len(jax.devices())}"
                )
            self.seq_mesh = Mesh(jax.devices()[:sequence_shards], ("seq",))
            self.mesh = None  # the unit axis owns the devices
        # expert parallelism: SwitchBiLSTM 'lstm' towers sharded one-per-
        # device-group (parallel/expert.py). Auto-enables when the tagger is
        # the twin-tower SwitchBiLSTM and >=2 devices exist — the dense DP
        # fallback would run BOTH towers on every chip.
        self.expert_mesh = None
        if expert_parallel is None:
            # auto never overrides an explicitly provided DP/TP mesh: expert
            # parallelism pins the run to N_EXPERTS device groups, which can
            # be slower than data parallelism over all chips — only
            # expert_parallel=True forces the override
            expert_parallel = (
                self.domain
                and cfg.switch == "lstm"
                and self.pipe_mesh is None
                and self.seq_mesh is None
                and self.mesh is None
                and not self.device_epochs  # the epoch windows own the step
                and len(jax.devices()) >= 2
            )
        if expert_parallel:
            from ..parallel.expert import N_EXPERTS, make_expert_mesh

            if not self.domain or cfg.switch != "lstm":
                raise ValueError(
                    "expert_parallel applies to SwitchBiLSTM with "
                    f"switch='lstm', got {architecture!r} (switch={cfg.switch!r})"
                )
            if len(jax.devices()) < N_EXPERTS:
                raise ValueError(
                    f"expert_parallel needs {N_EXPERTS} devices, "
                    f"have {len(jax.devices())}"
                )
            self.expert_mesh = make_expert_mesh()
            self.mesh = None  # the expert axis owns the devices
        # NaN tripwire, the analogue of the reference's always-on Lightning
        # Trainer(detect_anomaly=True) (/root/reference/train_fit.py:289)
        if detect_anomaly is None:
            detect_anomaly = os.environ.get("MTS_DETECT_ANOMALY", "1") != "0"
        self.detect_anomaly = detect_anomaly
        self.best_model_path: Optional[str] = None
        self._step_jit = None
        self._loss_jit = None
        self._place_params = None

    # -- jitted step/loss (jax.jit handles per-shape caching; padding is
    # bucketed so the number of distinct programs stays small) --------------
    def _train_step(self, params=None):
        if self._step_jit is None:
            arch = self.arch
            tx = self.tx

            if self.pipe_mesh is not None:
                from ..parallel.train_step import make_pipeline_train_step

                self._step_jit = make_pipeline_train_step(arch, tx, self.pipe_mesh)
                return self._step_jit

            if self.seq_mesh is not None or self.expert_mesh is not None:
                loss_of = self._parallel_loss_fn()

                def step(params, opt_state, src, lengths, tags, rng, extra):
                    loss, grads = jax.value_and_grad(
                        lambda p: loss_of(p, src, lengths, tags, rng, extra, True)
                    )(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state, loss

                self._step_jit = jax.jit(step, donate_argnums=(0, 1))
                return self._step_jit

            if self.mesh is not None:
                from ..parallel.train_step import make_sharded_train_step

                kind = "domain" if self.domain else ("double" if self.double else "")
                self._step_jit, self._place_params = make_sharded_train_step(
                    arch, tx, self.mesh, params, extra_kind=kind
                )
                return self._step_jit

            def step(params, opt_state, src, lengths, tags, rng, extra):
                def loss_fn(p):
                    if self.domain:
                        return arch.loss(p, src, lengths, tags, extra["domain"], rng=rng)
                    if self.double:
                        return arch.loss(p, src, lengths, tags, rng=rng, x2=extra["x2"])
                    return arch.loss(p, src, lengths, tags, rng=rng)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            self._step_jit = jax.jit(step, donate_argnums=(0, 1))
        return self._step_jit

    def _parallel_loss_fn(self):
        """Loss closure for the sequence- and expert-parallel Trainer modes
        (signature: params, src, lengths, tags, rng, extra, train)."""
        arch = self.arch
        if self.seq_mesh is not None:
            from ..parallel.sequence import sequence_sharded_transformer_loss

            mesh = self.seq_mesh

            def loss_of(p, src, lengths, tags, rng, extra, train):
                return sequence_sharded_transformer_loss(
                    mesh, arch, p, src, lengths, tags, axis="seq", rng=rng,
                    train=train,
                )

            return loss_of
        from ..parallel.expert import expert_sharded_switch_loss

        mesh = self.expert_mesh

        def loss_of(p, src, lengths, tags, rng, extra, train):
            return expert_sharded_switch_loss(
                mesh, arch, p, src, lengths, tags, extra["domain"], rng=rng,
                train=train,
            )

        return loss_of

    def _eval_loss(self):
        if self._loss_jit is None:
            arch = self.arch

            if self.seq_mesh is not None or self.expert_mesh is not None:
                loss_of = self._parallel_loss_fn()
                self._loss_jit = jax.jit(
                    lambda params, src, lengths, tags, extra: loss_of(
                        params, src, lengths, tags, None, extra, False
                    )
                )
                return self._loss_jit

            def eval_loss(params, src, lengths, tags, extra):
                if self.domain:
                    return arch.loss(params, src, lengths, tags, extra["domain"], rng=None)
                if self.double:
                    return arch.loss(params, src, lengths, tags, rng=None, x2=extra["x2"])
                return arch.loss(params, src, lengths, tags, rng=None)

            self._loss_jit = jax.jit(eval_loss)
        return self._loss_jit

    def _extra(self, batch):
        extra = {}
        if self.domain:
            extra["domain"] = jnp.asarray(batch["domain"])
        if self.double:
            extra["x2"] = jnp.asarray(batch["src_tokens2"])
        return extra

    def _to_device(self, batches: List[dict], shard: bool = True) -> List[dict]:
        return batches_to_device(batches, self.mesh if shard else None)

    def _pad_batch_axis(self, batch: dict) -> dict:
        """Pad the document axis to a multiple of the mesh 'data' axis.

        Pad docs get length 0 and tag -1, so every loss ignores them (masked
        means; CRF weights by valid docs) — numerics match single-device.
        """
        if self.mesh is None:
            return batch
        n_data = self.mesh.shape["data"]
        B = len(batch["src_lengths"])
        pad = (-B) % n_data
        if pad == 0:
            return batch
        out = dict(batch)
        for key in ("src_tokens", "tgt_tokens", "src_lengths", "domain", "src_tokens2"):
            if key in batch and hasattr(batch[key], "shape"):
                arr = np.asarray(batch[key])
                widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
                fill = -1.0 if key == "tgt_tokens" else 0
                out[key] = np.pad(arr, widths, constant_values=fill)
        out["n_real"] = batch.get("n_real", B)
        return out

    def _pad_unit_axis(self, batch: dict) -> dict:
        """Pad the UNIT axis for sequence sharding: L must divide by the
        shard count AND each shard must hold at least the widest attention
        half-window (parallel/sequence.py halo). Pad units get tag -1 and
        zero features; lengths are unchanged, so masked losses and decode
        slicing are untouched."""
        if self.seq_mesh is None:
            return batch
        n = self.seq_mesh.shape["seq"]
        L = np.asarray(batch["src_tokens"]).shape[1]
        windows = getattr(self.arch.encoder, "windows", None) or [0]
        shard_len = max(-(-L // n), max(windows) // 2)
        pad = shard_len * n - L
        if pad == 0:
            return batch
        out = dict(batch)
        for key in ("src_tokens", "tgt_tokens", "src_tokens2"):
            if key in batch and hasattr(batch[key], "shape"):
                arr = np.asarray(batch[key])
                widths = [(0, 0), (0, pad)] + [(0, 0)] * (arr.ndim - 2)
                fill = -1.0 if key == "tgt_tokens" else 0
                out[key] = np.pad(arr, widths, constant_values=fill)
        return out

    # -- device-resident epoch windows ---------------------------------------
    def _device_epochs_eligible(self, train_batches, valid_batches):
        """The window program is shape-monomorphic: every train batch must
        share one shape per key (likewise the valid batches among
        themselves), and only the plain single-device step is scanned.
        Returns (ok, reason)."""
        if (self.mesh is not None or self.pipe_mesh is not None
                or self.seq_mesh is not None or self.expert_mesh is not None):
            raise ValueError(
                "device_epochs runs the plain single-device step; it is "
                "exclusive with mesh/pipeline_stages/sequence_shards/"
                "expert_parallel"
            )
        if not train_batches:
            return False, "no train batches"

        def shapes(b):
            return tuple(
                (k, tuple(np.asarray(b[k]).shape))
                for k in _DEVICE_KEYS if k in b and hasattr(b[k], "shape")
            )

        for name, group in (("train", train_batches), ("valid", valid_batches or [])):
            want = shapes(group[0]) if group else None
            for b in group[1:]:
                if shapes(b) != want:
                    return False, f"ragged {name} batch shapes"
        return True, ""

    def _stack_batches(self, batches):
        """Host-stack uniform batches into one [NB, ...] pytree and ship it
        through the device link ONCE (the device-fit analogue of
        batches_to_device)."""
        stack = {
            "src": jnp.asarray(np.stack([np.asarray(b["src_tokens"]) for b in batches])),
            "len": jnp.asarray(np.stack([np.asarray(b["src_lengths"]) for b in batches])),
            "tgt": jnp.asarray(np.stack([np.asarray(b["tgt_tokens"]) for b in batches])),
        }
        if self.domain:
            stack["domain"] = jnp.asarray(
                np.stack([np.asarray(b["domain"]) for b in batches])
            )
        if self.double:
            stack["x2"] = jnp.asarray(
                np.stack([np.asarray(b["src_tokens2"]) for b in batches])
            )
        return stack

    def _fit_device_epochs(self, train_batches, valid_batches):
        """fit() with the epoch loop ON DEVICE (train/device_fit.py): one
        dispatch + one packed loss pull per K-epoch window instead of
        per-epoch tunnel round trips. Decision-for-decision the same
        scheduler/early-stop/checkpoint semantics as the host loop; the
        history and anomaly replay are reconstructed from the pulled
        per-batch losses."""
        from . import device_fit

        window = int(os.environ.get("MTS_DEVICE_EPOCH_WINDOW", "10"))
        nb = len(train_batches)
        nv = len(valid_batches) if valid_batches else 0
        weights = [
            b.get("n_real", len(b["src_lengths"])) for b in (valid_batches or [])
        ]

        rng = jax.random.PRNGKey(self.seed)
        rng, k_init = jax.random.split(rng)
        params = self.arch.init(k_init)
        self.tx = make_optimizer(self.optimizer_name, self.lr, self.clip)
        opt_state = self.tx.init(params)

        train_stack = self._stack_batches(train_batches)
        valid_stack = self._stack_batches(valid_batches) if nv else None

        key = (window, nb, nv, tuple(weights),
               self.monitor == "training_loss")
        if key not in self._fit_window_cache:
            self._fit_window_cache[key] = device_fit.make_fit_window(
                self.arch, self.tx,
                window=window, n_valid=nv, val_weights=weights or None,
                monitor_train=self.monitor == "training_loss",
                patience=self.patience, no_early_stop=self.no_early_stop,
                domain=self.domain, double=self.double,
            )
        window_fn = self._fit_window_cache[key]

        carry = device_fit.init_carry(params, opt_state, rng, self.lr)
        os.makedirs(self.check_dir, exist_ok=True)
        history = []
        anomaly_epoch = None
        try:
            e0, stopped = 0, False
            while e0 < self.max_epochs and not stopped:
                carry, packed = window_fn(
                    carry, np.int32(e0), np.int32(self.max_epochs),
                    train_stack, valid_stack,
                )
                tr, val, stops, ran = device_fit.unpack_window(packed, window, nb, nv)
                for i in range(window):
                    if not ran[i]:
                        break
                    epoch = e0 + i
                    batch_losses = [float(x) for x in tr[i]]
                    if self.detect_anomaly and not all(np.isfinite(batch_losses)):
                        bad = int(np.flatnonzero(~np.isfinite(batch_losses))[0])
                        anomaly_epoch = epoch
                        raise FloatingPointError(
                            f"detect_anomaly: non-finite training loss "
                            f"{batch_losses[bad]} at epoch {epoch}, batch {bad} "
                            f"(arch={self.arch_name}, lr={self.lr}; set "
                            f"MTS_DETECT_ANOMALY=0 to train through it)"
                        )
                    train_loss = float(np.mean(batch_losses))
                    val_loss = (
                        float(np.average(val[i], weights=weights)) if nv else None
                    )
                    history.append({
                        "epoch": epoch, "training_loss": train_loss,
                        "val_loss": val_loss,
                    })
                    if stops[i]:
                        stopped = True
                        break
                e0 += window
        finally:
            # one pull of the decision scalars; the host loop's rule — the
            # snapshot exists unless the anomaly fired before any epoch
            # finished its checkpoint logic (best_epoch tracks the DEVICE
            # decision, so >= anomaly_epoch means "never improved before it")
            best_epoch = int(carry["best_epoch"])
            if anomaly_epoch is None or best_epoch < anomaly_epoch:
                fname_val = float(carry["best_fname"])
                self.best_model_path = os.path.join(
                    self.check_dir,
                    ckpt_lib.checkpoint_name(best_epoch, fname_val, 0.5),
                )
                ckpt_lib.save(
                    self.best_model_path, carry["best_params"], self.cfg,
                    self.arch_name,
                    extra={"epoch": best_epoch,
                           "monitored": float(carry["best"])},
                )
        self.params = carry["params"]
        self.history = history
        return self.params, history

    # -- fit ----------------------------------------------------------------
    def fit(self, train_batches: List[dict], valid_batches: Optional[List[dict]] = None):
        if self.device_epochs:
            ok, why = self._device_epochs_eligible(train_batches, valid_batches)
            if ok:
                return self._fit_device_epochs(train_batches, valid_batches)
            import sys

            print(f"device_epochs: falling back to the host epoch loop ({why})",
                  file=sys.stderr)
        rng = jax.random.PRNGKey(self.seed)
        rng, k_init = jax.random.split(rng)
        params = self.arch.init(k_init)
        self.tx = make_optimizer(self.optimizer_name, self.lr, self.clip)
        if self.mesh is not None:
            self._train_step(params)  # builds the sharded step + placer
            params = self._place_params(params)
            train_batches = [self._pad_batch_axis(b) for b in train_batches]
        if self.seq_mesh is not None:
            train_batches = [self._pad_unit_axis(b) for b in train_batches]
            if valid_batches:
                valid_batches = [self._pad_unit_axis(b) for b in valid_batches]
        opt_state = self.tx.init(params)
        train_batches = self._to_device(train_batches)
        if valid_batches:
            # eval runs through the unsharded jit; batches are not padded to
            # the data-axis multiple, so keep them unsharded
            valid_batches = self._to_device(valid_batches, shard=False)

        sched = PlateauScheduler(self.lr)
        best = float("inf")
        bad_epochs = 0
        best_snapshot = None
        best_extra = {}
        os.makedirs(self.check_dir, exist_ok=True)

        history = []
        # the best snapshot is written in `finally` so a mid-training
        # crash (NaN tripwire, interrupt, backend failure) still leaves
        # the top-1 checkpoint on disk, as eager per-epoch saving did
        try:
            for epoch in range(self.max_epochs):
                train_losses = []
                for batch in train_batches:
                    rng, k = jax.random.split(rng)
                    step = self._train_step()
                    params, opt_state, loss = step(
                        params,
                        opt_state,
                        jnp.asarray(batch["src_tokens"]),
                        jnp.asarray(batch["src_lengths"]),
                        jnp.asarray(batch["tgt_tokens"]),
                        k,
                        self._extra(batch),
                    )
                    train_losses.append(loss)
                # queue the validation evals behind the train steps, then
                # drain the per-epoch scalars in batched device->host
                # transfers: each individual float() is a full tunnel round
                # trip (~30 ms), so per-batch pulls dominate epoch wall-clock
                # at small batch counts (scripts/bench_fit_epoch.py). Train
                # and val losses are pulled separately — they come from
                # different jit programs whose output shardings may differ
                # under a mesh, and eager jnp.stack requires colocation.
                val_device, weights = [], []
                if valid_batches:
                    ev = self._eval_loss()
                    for batch in valid_batches:
                        val_device.append(ev(
                            params,
                            jnp.asarray(batch["src_tokens"]),
                            jnp.asarray(batch["src_lengths"]),
                            jnp.asarray(batch["tgt_tokens"]),
                            self._extra(batch),
                        ))
                        weights.append(batch.get("n_real", len(batch["src_lengths"])))
                # empty-fold guard: fit([]) must keep the pre-batching
                # behavior (mean of [] -> nan, epoch proceeds on val loss)
                batch_losses = (
                    [float(l) for l in np.asarray(jnp.stack(train_losses))]
                    if train_losses else []
                )
                if self.detect_anomaly and not all(np.isfinite(batch_losses)):
                    bad = int(np.flatnonzero(~np.isfinite(batch_losses))[0])
                    raise FloatingPointError(
                        f"detect_anomaly: non-finite training loss "
                        f"{batch_losses[bad]} at epoch {epoch}, batch {bad} "
                        f"(arch={self.arch_name}, lr={self.lr}; set "
                        f"MTS_DETECT_ANOMALY=0 to train through it)"
                    )
                train_loss = float(np.mean(batch_losses))

                if valid_batches:
                    val_losses = np.asarray(jnp.stack(val_device))
                    val_loss = float(np.average(val_losses, weights=weights))
                else:
                    val_loss = None

                monitored = train_loss if self.monitor == "training_loss" else val_loss
                if monitored is None:
                    monitored = train_loss
                history.append({"epoch": epoch, "training_loss": train_loss, "val_loss": val_loss})

                # top-1 checkpoint on improvement (NaN counts as no improvement,
                # but the first epoch always checkpoints so a best path exists).
                # The snapshot stays ON DEVICE (a per-leaf copy costs ~nothing);
                # pulling params through the remote link every improving epoch
                # measured ~0.7-1 s — the single disk write happens at fit end.
                if not np.isfinite(monitored):
                    monitored = float("inf")
                if monitored < best or best_snapshot is None:
                    best = monitored
                    bad_epochs = 0
                    best_snapshot = jax.tree.map(lambda a: a.copy(), params)
                    fname_val = monitored if np.isfinite(monitored) else 9999.9999
                    self.best_model_path = os.path.join(
                        self.check_dir, ckpt_lib.checkpoint_name(epoch, fname_val, 0.5)
                    )
                    best_extra = {"epoch": epoch, "monitored": monitored}
                else:
                    bad_epochs += 1
                    if not self.no_early_stop and bad_epochs >= self.patience:
                        break

                opt_state = _set_lr(opt_state, sched.step(monitored))

        finally:
            if best_snapshot is not None:
                ckpt_lib.save(self.best_model_path, best_snapshot, self.cfg,
                              self.arch_name, extra=best_extra)
        self.params = params
        self.history = history
        return params, history

    def save_final(self, params):
        """Reference's -s_last / no_validation path: final=0.500.ckpt."""
        path = os.path.join(self.check_dir, "final=0.500.ckpt")
        ckpt_lib.save(path, params, self.cfg, self.arch_name, extra={"final": True})
        self.best_model_path = path
        return path

    # -- test ---------------------------------------------------------------
    def test(self, params, test_batches: List[dict]):
        """Per-document decode + metrics; returns the reference's results
        dict plus per-document results/scores lists."""
        if self.zero_baseline:
            # reference hardcodes 0.4 for the never-predict baseline
            # (lightning_model.py:577-580)
            threshold = 0.4
        else:
            threshold = self.threshold if self.threshold is not None else 0.4
            if not threshold:
                threshold = 0.5

        decode = None
        per_doc, all_scores = [], []

        # dispatch decodes AHEAD of pulling results: the per-document
        # metric math below is host-bound, and interleaving it with the
        # pulls would idle the device between batches; decode outputs
        # are [B,L(,C)] — trivially small to keep as numpy
        q = BoundedDrain(lambda it: (it[0], np.asarray(it[1]), np.asarray(it[2])))
        for batch in test_batches:
            if self.seq_mesh is not None:
                batch = self._pad_unit_axis(batch)
            if self.zero_baseline:
                # never-predict baseline: no decode, so don't pay the
                # tunnel upload for inputs the device would never read
                scores = np.zeros(batch["src_tokens"].shape[:2], np.float32)
                tags = np.zeros(batch["src_tokens"].shape[:2], bool)
            else:
                src = jnp.asarray(batch["src_tokens"])
                lengths = jnp.asarray(batch["src_lengths"])
                if decode is None:
                    arch = self.arch
                    if self.seq_mesh is not None:
                        from ..parallel.sequence import (
                            sequence_sharded_transformer_decode,
                        )

                        seq_mesh = self.seq_mesh
                        decode = jax.jit(
                            lambda p, x, l: sequence_sharded_transformer_decode(
                                seq_mesh, arch, p, x, l, threshold, axis="seq"
                            )
                        )
                    elif self.expert_mesh is not None:
                        from ..parallel.expert import expert_sharded_switch_decode

                        ex_mesh = self.expert_mesh
                        decode = jax.jit(
                            lambda p, x, l, d: expert_sharded_switch_decode(
                                ex_mesh, arch, p, x, l, d, threshold
                            )
                        )
                    elif self.domain:
                        decode = jax.jit(lambda p, x, l, d: arch.decode(p, x, l, d, threshold))
                    elif self.double:
                        decode = jax.jit(lambda p, x, l, x2: arch.decode(p, x, l, threshold, x2=x2))
                    else:
                        decode = jax.jit(lambda p, x, l: arch.decode(p, x, l, threshold))
                if self.domain:
                    scores, tags = decode(params, src, lengths, jnp.asarray(batch["domain"]))
                elif self.double:
                    scores, tags = decode(params, src, lengths, jnp.asarray(batch["src_tokens2"]))
                else:
                    scores, tags = decode(params, src, lengths)
            q.add((batch, scores, tags))

        for batch, scores_np, tags_np in q.finish():
            for i in range(batch.get("n_real", len(batch["src_lengths"]))):
                L = int(batch["src_lengths"][i])
                tag = tags_np[i][:L].astype(int).tolist()
                target = np.asarray(batch["tgt_tokens"][i][:L]).astype(int).tolist()
                if self.eb:
                    tag[-1] = 0
                    target[-1] = 0
                # the reference tests with batch size 1 (train_fit.py:116-157)
                # so each dict in its all_results collection is one DOCUMENT's
                # own metrics (lightning_model.py:671-674); replicate that.
                if self.metric.lower() == "b":
                    p, r, f1, b = M.b_measure(tag, target)
                    doc = {
                        "b_precision": p, "b_recall": r, "b_f1": f1,
                        "threshold": threshold, "test_loss": b,
                    }
                elif self.metric.lower() == "scaiano":
                    p, r, f1 = M.win_pr(tag, target)
                    doc = {
                        "b_precision": p, "b_recall": r,
                        "threshold": threshold, "test_loss": f1,
                    }
                else:
                    pk = M.compute_Pk(tag, target)
                    f1 = M.boundary_f1(target, tag)
                    try:
                        wd = M.compute_window_diff(tag, target)
                    except AssertionError:
                        wd = pk
                    doc = {
                        "Pk_loss": pk, "F1_loss": f1, "WD_loss": wd,
                        "threshold": threshold,
                    }
                    if self.metric == "F1":
                        doc["test_loss"] = doc.pop("F1_loss")
                    elif self.metric == "WD":
                        doc["test_loss"] = doc.pop("WD_loss")
                    else:
                        doc["test_loss"] = doc.pop("Pk_loss")
                per_doc.append(doc)

                # stored scores must match what the decode consumed: raw
                # head logits — [L] for the sigmoid heads (BCE/Focal), the
                # full [L, C] row for CrossEntropy (the reference stores the
                # model's raw score tensor, lightning_model.py:673-674)
                if scores_np.ndim == 3:
                    if scores_np.shape[-1] > 1:
                        doc_scores = scores_np[i][:L]
                    else:
                        doc_scores = scores_np[i][:L, 0]
                elif scores_np.ndim == 2:
                    doc_scores = scores_np[i][:L]
                else:  # CRF decode: one Viterbi score per document
                    doc_scores = scores_np[i]
                all_scores.append(np.atleast_1d(np.asarray(doc_scores, np.float64)))

        # corpus aggregate = mean over documents (Lightning's epoch-mean
        # log_dict with bs=1 reduces to exactly this)
        results = {
            k: float(np.mean([d[k] for d in per_doc])) for k in per_doc[0]
        }
        results["threshold"] = threshold
        return results, per_doc, all_scores

    def search_threshold(self, params, valid_batches: List[dict]):
        """Search the decode threshold on validation documents.

        The reference's -sth path collects validation scores but its test
        branch is NotImplemented (lightning_model.py:569-574); this is the
        working equivalent: evaluate the reference's candidate grid
        {.05,.1,.2,.3,.4,.5,.6} on the monitored metric and return the best.
        """
        candidates = [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
        arch = self.arch
        if self.seq_mesh is not None:
            # same sharded path test() uses — the full-document activations
            # that motivated sequence sharding do not fit one chip here either
            from ..parallel.sequence import sequence_sharded_transformer_scores

            seq_mesh = self.seq_mesh
            decode_scores = jax.jit(
                lambda p, x, l: sequence_sharded_transformer_scores(
                    seq_mesh, arch, p, x, l, axis="seq"
                )
            )
        elif self.expert_mesh is not None:
            from ..parallel.expert import expert_sharded_switch_scores

            ex_mesh = self.expert_mesh
            decode_scores = jax.jit(
                lambda p, x, l, d: expert_sharded_switch_scores(
                    ex_mesh, arch, p, x, l, d
                )
            )
        elif self.domain:
            decode_scores = jax.jit(lambda p, x, l, d: arch.decode(p, x, l, d, 0.5)[0])
        elif self.double:
            decode_scores = jax.jit(lambda p, x, l, x2: arch.decode(p, x, l, 0.5, x2=x2)[0])
        else:
            decode_scores = jax.jit(lambda p, x, l: arch.decode(p, x, l, 0.5)[0])
        # dispatch ahead of the pulls with a bounded in-flight window
        # (same rationale as test() — ndim for the CRF early-out is shape
        # metadata, no pull)
        q = BoundedDrain(lambda it: (it[0], np.asarray(it[1])))
        for batch in valid_batches:
            if self.seq_mesh is not None:
                batch = self._pad_unit_axis(batch)
            args = [
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["src_lengths"]),
            ]
            if self.domain:
                args.append(jnp.asarray(batch["domain"]))
            elif self.double:
                args.append(jnp.asarray(batch["src_tokens2"]))
            dev_scores = decode_scores(*args)
            if dev_scores.ndim == 1:
                # CRF decode: one Viterbi score per doc, no threshold to
                # search — keep the reference default
                return 0.5, float("nan")
            q.add((batch, dev_scores))
        docs = []
        for batch, scores in q.finish():
            for i in range(batch.get("n_real", len(batch["src_lengths"]))):
                L = int(batch["src_lengths"][i])
                s = scores[i][:L]  # [L, C] head logits (C=1 sigmoid heads)
                t = np.asarray(batch["tgt_tokens"][i][:L]).astype(int)
                # probabilities EXACTLY as head_decode thresholds them
                # (models/base.py:84-90): softmax class-1 for CrossEntropy,
                # sigmoid of the single logit otherwise
                if s.ndim == 2 and self.cfg.loss_fn == "CrossEntropy" and s.shape[-1] > 1:
                    e = np.exp(s - s.max(-1, keepdims=True))
                    prob = e[..., 1] / e.sum(-1)
                elif s.ndim == 2:
                    prob = 1.0 / (1.0 + np.exp(-s[..., 0]))
                else:  # [L] pre-sigmoid scores
                    prob = 1.0 / (1.0 + np.exp(-s))
                docs.append((prob, t))

        # candidates are scored on the MONITORED metric itself: Pk/WD
        # minimize; F1, B-similarity, and WinPR-F1 maximize
        minimize = self.metric in ("Pk", "WD")
        best_th, best_val = 0.5, float("inf") if minimize else -float("inf")
        for th in candidates:
            vals = []
            for prob, t in docs:
                pred = (prob > th).astype(int)
                if self.metric == "F1":
                    vals.append(M.boundary_f1(t.tolist(), pred.tolist()))
                elif self.metric == "WD":
                    try:
                        vals.append(M.compute_window_diff(pred.tolist(), t.tolist()))
                    except AssertionError:
                        vals.append(M.compute_Pk(pred.tolist(), t.tolist()))
                elif self.metric.lower() == "b":
                    vals.append(M.b_measure(pred.tolist(), t.tolist())[3])
                elif self.metric.lower() == "scaiano":
                    vals.append(M.win_pr(pred.tolist(), t.tolist())[2])
                else:
                    vals.append(M.compute_Pk(pred.tolist(), t.tolist()))
            v = float(np.mean(vals)) if vals else (1.0 if minimize else 0.0)
            if (minimize and v < best_val) or (not minimize and v > best_val):
                best_val, best_th = v, th
        return best_th, best_val

    def predict(self, params, batches: List[dict], threshold: float = 0.5):
        """Raw tag lists per document (reference predict_step); handles the
        domain-adaptive, double-input, and sharded modes like test() does."""
        arch = self.arch
        if self.seq_mesh is not None:
            from ..parallel.sequence import sequence_sharded_transformer_decode

            seq_mesh = self.seq_mesh
            decode = jax.jit(
                lambda p, x, l: sequence_sharded_transformer_decode(
                    seq_mesh, arch, p, x, l, threshold, axis="seq"
                )
            )
        elif self.expert_mesh is not None:
            from ..parallel.expert import expert_sharded_switch_decode

            ex_mesh = self.expert_mesh
            decode = jax.jit(
                lambda p, x, l, d: expert_sharded_switch_decode(
                    ex_mesh, arch, p, x, l, d, threshold
                )
            )
        elif self.domain:
            decode = jax.jit(lambda p, x, l, d: arch.decode(p, x, l, d, threshold))
        elif self.double:
            decode = jax.jit(lambda p, x, l, x2: arch.decode(p, x, l, threshold, x2=x2))
        else:
            decode = jax.jit(lambda p, x, l: arch.decode(p, x, l, threshold))
        # bounded dispatch-ahead window, as in test()
        q = BoundedDrain(lambda it: (it[0], np.asarray(it[1])))
        for batch in batches:
            if self.seq_mesh is not None:
                batch = self._pad_unit_axis(batch)
            args = [
                params,
                jnp.asarray(batch["src_tokens"]),
                jnp.asarray(batch["src_lengths"]),
            ]
            if self.domain:
                args.append(jnp.asarray(batch["domain"]))
            elif self.double:
                args.append(jnp.asarray(batch["src_tokens2"]))
            scores, tags = decode(*args)
            q.add((batch, tags))
        out = []
        for batch, tags_np in q.finish():
            for i in range(batch.get("n_real", len(batch["src_lengths"]))):
                L = int(batch["src_lengths"][i])
                out.append(tags_np[i][:L].astype(int).tolist())
        return out
