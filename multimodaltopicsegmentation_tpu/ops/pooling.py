"""Frame -> unit pooling: the reference's 7 reduction variants, on device.

Frame-level encoders (wav2vec2, CREPE) emit [n_frames, d] per unit; the
reference then builds 7 pooled variants with per-unit numpy loops
(/root/reference/extract_embeddings.py:644-667): _mean, _max, _mean_std,
_max_std, _last, _delta_gap, and _no_reduction.

Here a document is one [total_frames, d] array plus a frame->unit segment
id vector, and every variant is a masked segment reduction (segment_sum /
segment_max / gathers) — one pass, no host loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_mean(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int) -> jnp.ndarray:
    s = jax.ops.segment_sum(frames, seg_ids, n_units)
    cnt = jax.ops.segment_sum(jnp.ones((frames.shape[0],), frames.dtype), seg_ids, n_units)
    return s / jnp.maximum(cnt, 1.0)[:, None]


def segment_std(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int) -> jnp.ndarray:
    mean = segment_mean(frames, seg_ids, n_units)
    sq = jax.ops.segment_sum(frames**2, seg_ids, n_units)
    cnt = jax.ops.segment_sum(jnp.ones((frames.shape[0],), frames.dtype), seg_ids, n_units)
    var = sq / jnp.maximum(cnt, 1.0)[:, None] - mean**2
    return jnp.sqrt(jnp.maximum(var, 0.0))


def _seg_count(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int) -> jnp.ndarray:
    return jax.ops.segment_sum(
        jnp.ones((frames.shape[0],), frames.dtype), seg_ids, n_units
    )


def segment_max(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int) -> jnp.ndarray:
    # an empty segment's segment_max is the dtype's min sentinel (-inf for
    # floats); zero it like the mean/std reductions so a unit with no
    # frames yields a zero row, not garbage
    cnt = _seg_count(frames, seg_ids, n_units)
    return jnp.where(cnt[:, None] > 0,
                     jax.ops.segment_max(frames, seg_ids, n_units), 0.0)


def segment_last(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int) -> jnp.ndarray:
    """Embedding of each unit's final frame (zeros for an empty unit)."""
    idx = jnp.arange(frames.shape[0])
    last_idx = jnp.clip(jax.ops.segment_max(idx, seg_ids, n_units),
                        0, max(frames.shape[0] - 1, 0))
    cnt = _seg_count(frames, seg_ids, n_units)
    return jnp.where(cnt[:, None] > 0, frames[last_idx], 0.0)


def segment_first(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int) -> jnp.ndarray:
    idx = jnp.arange(frames.shape[0])
    first_idx = jnp.clip(jax.ops.segment_min(idx, seg_ids, n_units),
                         0, max(frames.shape[0] - 1, 0))
    cnt = _seg_count(frames, seg_ids, n_units)
    return jnp.where(cnt[:, None] > 0, frames[first_idx], 0.0)


def pool(frames: jnp.ndarray, seg_ids: jnp.ndarray, n_units: int, variant: str) -> jnp.ndarray:
    """One of the reference's pooling variants.

    _delta_gap is the reference's boundary-contrast feature: the NEXT unit's
    first frame minus this unit's last frame; the final unit (no successor)
    keeps its own last frame (extract_embeddings.py:661-666).
    """
    if variant == "mean" or variant == "_mean":
        return segment_mean(frames, seg_ids, n_units)
    if variant in ("max", "_max"):
        return segment_max(frames, seg_ids, n_units)
    if variant in ("mean_std", "_mean_std"):
        return jnp.concatenate(
            [segment_mean(frames, seg_ids, n_units), segment_std(frames, seg_ids, n_units)],
            axis=-1,
        )
    if variant in ("max_std", "_max_std"):
        return jnp.concatenate(
            [segment_max(frames, seg_ids, n_units), segment_std(frames, seg_ids, n_units)],
            axis=-1,
        )
    if variant in ("last", "_last"):
        return segment_last(frames, seg_ids, n_units)
    if variant in ("delta_gap", "_delta_gap"):
        # reference: next unit's first frame minus this unit's last frame;
        # the final unit keeps its last frame verbatim
        # (extract_embeddings.py:662-668). CONTRACT: unit n_units-1 must be
        # a real (non-empty) unit — the extract CLI always passes exact
        # unit counts; padding units past the real final one would move
        # this .at[-1] rule onto a zero row.
        last = segment_last(frames, seg_ids, n_units)
        first = segment_first(frames, seg_ids, n_units)
        next_first = jnp.concatenate([first[1:], jnp.zeros_like(first[:1])], axis=0)
        gap = next_first - last
        return gap.at[-1].set(last[-1])
    raise ValueError(f"unknown pooling variant {variant!r}")


POOLING_VARIANTS = ("_mean", "_max", "_mean_std", "_max_std", "_last", "_delta_gap")
