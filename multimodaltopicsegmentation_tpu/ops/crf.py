"""Linear-chain CRF: scan-based forward algorithm and fully on-device Viterbi.

Reference semantics (/root/reference/models/CRF.py:95-240): START/STOP tags
appended to the tag set (C = num_tags + 2), transition matrix T[i, j] =
score of moving FROM j TO i, IMPOSSIBLE = -1e4 walls for "into START" and
"out of STOP", loss = mean(log-partition - gold score).

TPU design differences from the reference:
- the per-timestep Python loops (forward recursion CRF.py:232-239, Viterbi
  CRF.py:188-201) become `lax.scan` over time with [B, C] carries;
- the reference's HOST-side backpointer walk (CRF.py:203-215,
  `bps.cpu().numpy()` + per-sample Python loop) becomes a reverse
  `lax.scan` gather, so decode never leaves the device and is batched.

The tag count C is tiny (4 for boundary tagging) — these are VPU ops; the
MXU work is in the emission projection upstream.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

IMPOSSIBLE = -1e4


def crf_params(rng, in_features: int, num_tags: int, dtype=jnp.float32) -> dict:
    """Emission projection + transition matrix with START/STOP walls."""
    C = num_tags + 2
    start_idx, stop_idx = C - 2, C - 1
    k1, k2, k3 = jax.random.split(rng, 3)
    bound = 1.0 / jnp.sqrt(in_features)
    fc_w = jax.random.uniform(k1, (in_features, C), dtype, -bound, bound)
    fc_b = jax.random.uniform(k2, (C,), dtype, -bound, bound)
    trans = jax.random.normal(k3, (C, C), dtype)
    trans = trans.at[start_idx, :].set(IMPOSSIBLE)  # nothing transitions INTO start
    trans = trans.at[:, stop_idx].set(IMPOSSIBLE)  # nothing transitions OUT of stop
    return {"fc_w": fc_w, "fc_b": fc_b, "transitions": trans}


def _emissions(params: dict, features: jnp.ndarray) -> jnp.ndarray:
    return features @ params["fc_w"] + params["fc_b"]


def _num_tags(params: dict) -> int:
    return params["transitions"].shape[0]


def forward_algorithm(params: dict, emissions: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Log-partition per batch element. emissions [B, L, C], mask [B, L]."""
    B, L, C = emissions.shape
    start_idx, stop_idx = C - 2, C - 1
    trans = params["transitions"]

    init = jnp.full((B, C), IMPOSSIBLE, emissions.dtype).at[:, start_idx].set(0.0)

    def step(scores, xs):
        emit_t, mask_t = xs  # [B, C], [B]
        # scores[b, j] + trans[i, j] + emit[b, i] -> logsumexp over j
        cand = scores[:, None, :] + trans[None, :, :] + emit_t[:, :, None]
        new = jax.scipy.special.logsumexp(cand, axis=-1)
        scores = jnp.where(mask_t[:, None] > 0, new, scores)
        return scores, None

    xs = (jnp.transpose(emissions, (1, 0, 2)), jnp.transpose(mask, (1, 0)))
    scores, _ = lax.scan(step, init, xs)
    return jax.scipy.special.logsumexp(scores + trans[stop_idx][None, :], axis=-1)


def gold_score(
    params: dict, emissions: jnp.ndarray, tags: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Score of the reference tag path, masked to each length."""
    B, L, C = emissions.shape
    start_idx, stop_idx = C - 2, C - 1
    trans = params["transitions"]
    tags = tags.astype(jnp.int32)

    emit = jnp.take_along_axis(emissions, tags[:, :, None], axis=2)[:, :, 0]
    prev = jnp.concatenate(
        [jnp.full((B, 1), start_idx, jnp.int32), tags[:, :-1]], axis=1
    )
    trans_scores = trans[tags, prev]
    seq_score = jnp.sum((emit + trans_scores) * mask, axis=1)

    lengths = jnp.sum(mask, axis=1).astype(jnp.int32)
    # tag right before STOP: last valid tag (or START for empty sequences)
    last_tag = jnp.where(
        lengths > 0,
        jnp.take_along_axis(tags, jnp.maximum(lengths - 1, 0)[:, None], axis=1)[:, 0],
        start_idx,
    )
    return seq_score + trans[stop_idx, last_tag]


def crf_loss(
    params: dict, features: jnp.ndarray, tags: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean negative log-likelihood (reference CRF.loss, models/CRF.py:130-146).

    The mean runs over documents with at least one valid unit so that
    zero-length padding docs (added to make the batch axis divisible by the
    mesh 'data' axis) contribute nothing — identical to a plain batch mean
    when every document is real.
    """
    emissions = _emissions(params, features)
    fwd = forward_algorithm(params, emissions, mask)
    gold = gold_score(params, emissions, tags, mask)
    nll = fwd - gold
    valid = (jnp.sum(mask, axis=1) > 0).astype(nll.dtype)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def viterbi_decode(params: dict, features: jnp.ndarray, mask: jnp.ndarray):
    """Best score and best path, entirely on device.

    Returns (best_score [B], paths [B, L] int32). Positions beyond each
    length hold the last valid tag repeated (callers slice to lengths, as
    the reference does on host lists).
    """
    emissions = _emissions(params, features)
    B, L, C = emissions.shape
    start_idx, stop_idx = C - 2, C - 1
    trans = params["transitions"]
    lengths = jnp.sum(mask, axis=1).astype(jnp.int32)

    init = jnp.full((B, C), IMPOSSIBLE, emissions.dtype).at[:, start_idx].set(0.0)

    def fwd_step(scores, xs):
        emit_t, mask_t = xs
        cand = scores[:, None, :] + trans[None, :, :]  # [B, i, j]
        best_prev = jnp.argmax(cand, axis=-1)  # [B, C]
        new = jnp.max(cand, axis=-1) + emit_t
        scores = jnp.where(mask_t[:, None] > 0, new, scores)
        return scores, best_prev

    xs = (jnp.transpose(emissions, (1, 0, 2)), jnp.transpose(mask, (1, 0)))
    final, bps = lax.scan(fwd_step, init, xs)  # bps: [L, B, C]

    final = final + trans[stop_idx][None, :]
    best_score = jnp.max(final, axis=-1)
    best_last = jnp.argmax(final, axis=-1).astype(jnp.int32)  # [B]

    # Reverse on-device backtrace: y[len-1] = best_last;
    # y[t] = bps[t+1][y[t+1]] for t < len-1.
    bps_next = jnp.concatenate([bps[1:], jnp.zeros((1, B, C), bps.dtype)], axis=0)
    t_idx = jnp.arange(L, dtype=jnp.int32)

    def back_step(carry, xs):
        bp_t, t = xs  # [B, C], scalar
        at_end = t >= lengths - 1
        followed = jnp.take_along_axis(bp_t, carry[:, None], axis=1)[:, 0].astype(jnp.int32)
        tag_t = jnp.where(at_end, best_last, followed)
        return tag_t, tag_t

    _, path_rev = lax.scan(back_step, best_last, (bps_next, t_idx), reverse=True)
    paths = jnp.transpose(path_rev, (1, 0))  # [B, L]
    return best_score, paths
