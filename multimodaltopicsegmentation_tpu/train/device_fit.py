"""Device-resident fit: whole epoch WINDOWS in one jitted program.

The host epoch loop (train/loop.py Trainer.fit) costs ~0.16 s/epoch at the
flagship shape after round-4's batched loss pulls — but only ~40 ms of that
is compute. The rest is per-epoch remote-tunnel round trips (two stacked
loss pulls + the LR-update dispatch) and host bookkeeping, both of which
exist only because the plateau scheduler / early stopping / top-1 snapshot
decisions were made on host.

This module moves the WHOLE decision loop on device, the TPU-native way:

  lax.scan over K epochs
    lax.cond (skip compute once stopped / past max_epochs)
      lax.scan over the stacked train batches  (train steps)
      lax.scan over the stacked valid batches  (eval losses)
      checkpoint-best / plateau-LR / early-stop updates on the scan carry

One dispatch per K-epoch window, and the window's per-batch losses + stop
flags come back as ONE packed f32 transfer. The best parameters are kept in
the carry via a `jnp.where` tree-select (the device-side analogue of the
host loop's on-device snapshot), so nothing crosses the link until fit end.

Semantics mirror the host loop (lightning_model.py:  the reference's
ReduceLROnPlateau / EarlyStopping / ModelCheckpoint stack) decision for
decision, with the SAME rng split sequence, so the two paths train
identically up to compile-scheduling float noise:

- monitored = train or weighted-val loss; non-finite -> +inf
- improvement: strictly smaller than best, first epoch always improves
- early stop: `bad_epochs >= patience` AFTER a non-improving epoch; the
  stopping epoch skips the scheduler step, exactly like the host `break`
- plateau: torch ReduceLROnPlateau(min, factor=0.8, patience=10,
  rel threshold 1e-4), applied through the optax injected hyperparam

Eligibility is the caller's job (uniform batch shapes, no mesh); the
window is shape-monomorphic so ragged corpora keep the host loop.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

SCHED_FACTOR = 0.8
SCHED_PATIENCE = 10
SCHED_RTOL = 1e-4
NAN_FNAME = 9999.9999  # host loop's filename stand-in for non-finite losses


def with_lr(opt_state, lr):
    """Functional counterpart of train.loop._set_lr: rebuild the optax
    state with the injected learning_rate replaced (jit/scany-safe)."""
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple):
        rebuilt = tuple(with_lr(s, lr) for s in opt_state)
        if hasattr(opt_state, "_fields"):  # a NamedTuple state
            return type(opt_state)(*rebuilt)
        return rebuilt
    return opt_state


def init_carry(params, opt_state, rng, lr: float):
    """The window scan carry. `best_params` starts as a copy of params so
    the pytree structure is fixed; epoch 0 always overwrites it (the host
    loop's `best_snapshot is None` rule)."""
    return {
        "params": params,
        "opt": opt_state,
        "rng": rng,
        "lr": jnp.asarray(lr, jnp.float32),
        "sched_best": jnp.asarray(jnp.inf, jnp.float32),
        "sched_bad": jnp.asarray(0, jnp.int32),
        "best": jnp.asarray(jnp.inf, jnp.float32),
        "bad": jnp.asarray(0, jnp.int32),
        "stopped": jnp.asarray(False),
        "best_params": jax.tree.map(lambda a: a.copy(), params),
        "best_epoch": jnp.asarray(0, jnp.int32),
        "best_fname": jnp.asarray(NAN_FNAME, jnp.float32),
    }


def make_fit_window(
    arch,
    tx,
    *,
    window: int,
    n_valid: int,
    val_weights: Optional[list],
    monitor_train: bool,
    patience: int,
    no_early_stop: bool,
    domain: bool = False,
    double: bool = False,
):
    """Build the jitted K-epoch window program.

    Returns fn(carry, epoch0, max_epochs, train_stack, valid_stack) ->
    (carry, packed) where `packed` is ONE f32 vector laid out as
    [K*NB train losses | K*NV val losses | K stop-flags | K ran-flags]
    so the host drains a window in a single device->host transfer.
    `epoch0`/`max_epochs` are traced scalars: re-fitting with a different
    max_epochs does not recompile.
    """
    has_val = n_valid > 0
    w_vec = (
        jnp.asarray(val_weights, jnp.float32) if has_val and val_weights is not None
        else (jnp.ones((n_valid,), jnp.float32) if has_val else None)
    )

    def batch_loss(p, xs, k):
        if domain:
            return arch.loss(p, xs["src"], xs["len"], xs["tgt"], xs["domain"], rng=k)
        if double:
            return arch.loss(p, xs["src"], xs["len"], xs["tgt"], rng=k, x2=xs["x2"])
        return arch.loss(p, xs["src"], xs["len"], xs["tgt"], rng=k)

    def fit_window(carry, epoch0, max_epochs, train_stack, valid_stack):
        nb = train_stack["src"].shape[0]

        def run_epoch(c, epoch):
            def batch_step(bc, xs):
                params, opt, rng = bc
                rng, k = jax.random.split(rng)  # same split order as the host loop
                loss, grads = jax.value_and_grad(batch_loss)(params, xs, k)
                updates, opt = tx.update(grads, opt, params)
                params = optax.apply_updates(params, updates)
                return (params, opt, rng), loss

            (params, opt, rng), tr_losses = jax.lax.scan(
                batch_step, (c["params"], c["opt"], c["rng"]), train_stack
            )
            train_loss = jnp.mean(tr_losses)

            if has_val:
                def val_one(_, xs):
                    return (), batch_loss(params, xs, None)

                _, val_losses = jax.lax.scan(val_one, (), valid_stack)
                val_loss = jnp.sum(val_losses * w_vec) / jnp.sum(w_vec)
            else:
                val_losses = jnp.zeros((0,), jnp.float32)
                val_loss = train_loss

            monitored = train_loss if (monitor_train or not has_val) else val_loss
            monitored = jnp.where(jnp.isfinite(monitored), monitored, jnp.inf)

            # top-1 checkpoint selection (host: `monitored < best or first`)
            improved = (monitored < c["best"]) | (epoch == 0)
            best = jnp.where(improved, monitored, c["best"])
            bad = jnp.where(improved, 0, c["bad"] + 1)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old),
                params, c["best_params"],
            )
            best_epoch = jnp.where(improved, epoch, c["best_epoch"])
            best_fname = jnp.where(
                improved,
                jnp.where(jnp.isfinite(monitored), monitored, NAN_FNAME),
                c["best_fname"],
            )
            if no_early_stop:
                stop = jnp.asarray(False)
            else:
                stop = (~improved) & (bad >= patience)

            # plateau scheduler — skipped on the stopping epoch, exactly
            # like the host loop's `break` before `sched.step`
            s_improved = monitored < c["sched_best"] * (1.0 - SCHED_RTOL)
            s_best = jnp.where(s_improved, monitored, c["sched_best"])
            s_bad = jnp.where(s_improved, 0, c["sched_bad"] + 1)
            drop = s_bad > SCHED_PATIENCE
            lr = jnp.where(drop, c["lr"] * SCHED_FACTOR, c["lr"])
            s_bad = jnp.where(drop, 0, s_bad)
            lr = jnp.where(stop, c["lr"], lr)
            s_best = jnp.where(stop, c["sched_best"], s_best)
            s_bad = jnp.where(stop, c["sched_bad"], s_bad)

            new = {
                "params": params,
                "opt": with_lr(opt, lr),
                "rng": rng,
                "lr": lr,
                "sched_best": s_best,
                "sched_bad": s_bad,
                "best": best,
                "bad": bad,
                "stopped": c["stopped"] | stop,
                "best_params": best_params,
                "best_epoch": best_epoch,
                "best_fname": best_fname,
            }
            return new, (tr_losses, val_losses, stop)

        def epoch_body(c, e_idx):
            epoch = epoch0 + e_idx
            ran = (~c["stopped"]) & (epoch < max_epochs)

            def skip_epoch(c):
                return c, (
                    jnp.full((nb,), jnp.nan, jnp.float32),
                    jnp.full((n_valid,), jnp.nan, jnp.float32),
                    jnp.asarray(False),
                )

            c, ys = jax.lax.cond(ran, lambda c: run_epoch(c, epoch), skip_epoch, c)
            return c, ys + (ran,)

        carry, (tr, val, stops, ran) = jax.lax.scan(
            epoch_body, carry, jnp.arange(window, dtype=jnp.int32)
        )
        packed = jnp.concatenate([
            tr.reshape(-1).astype(jnp.float32),
            val.reshape(-1).astype(jnp.float32),
            stops.astype(jnp.float32),
            ran.astype(jnp.float32),
        ])
        return carry, packed

    return jax.jit(fit_window, donate_argnums=(0,))


def unpack_window(packed, window: int, nb: int, nv: int):
    """Split the single pulled f32 vector back into per-epoch pieces.
    Returns (train_losses [K, NB], val_losses [K, NV], stop [K], ran [K])."""
    import numpy as np

    packed = np.asarray(packed)
    tr = packed[: window * nb].reshape(window, nb)
    val = packed[window * nb: window * (nb + nv)].reshape(window, nv)
    stops = packed[window * (nb + nv): window * (nb + nv + 1)] > 0.5
    ran = packed[window * (nb + nv + 1):] > 0.5
    return tr, val, stops, ran
