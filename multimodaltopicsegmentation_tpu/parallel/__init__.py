"""TPU-native parallelism layers (the reference has none — SURVEY.md §2.2).

Modules: mesh (DP+TP shardings), train_step (sharded training),
sequence (ring-halo local attention), pipeline (GPipe microbatching),
expert (domain-routed towers), multihost (DCN input pipeline).
"""


def shard_map():
    """jax.shard_map across the versions this framework supports (it moved
    out of jax.experimental); single shim shared by every parallel module."""
    try:
        from jax import shard_map as sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    return sm
