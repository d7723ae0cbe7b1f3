"""Sequence-sharded local attention vs single-device, on the 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodaltopicsegmentation_tpu.ops.attention import local_attention
from multimodaltopicsegmentation_tpu.parallel.sequence import (
    sequence_sharded_local_attention,
)


@pytest.mark.parametrize("window,L", [(8, 64), (16, 128)])
def test_seq_sharded_matches_single_device(window, L):
    devices = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, ("data", "model"))

    rng = np.random.default_rng(0)
    B, H, Dh = 2, 2, 8
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    lengths = np.array([L, L - 11])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))

    ref = local_attention(q, k, v, window, mask, use_pallas=False)
    with mesh:
        out = sequence_sharded_local_attention(mesh, q, k, v, window, mask)

    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :Lb], np.asarray(ref)[b, :, :Lb], atol=2e-5
        )


def test_seq_sharded_long_doc():
    """3600-unit document (the reference's truncation budget) sharded 8 ways."""
    devices = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, ("data", "model"))
    rng = np.random.default_rng(1)
    B, H, L, Dh = 1, 2, 3600, 8
    window = 240
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    ref = local_attention(q, k, v, window, mask, use_pallas=False)
    with mesh:
        out = sequence_sharded_local_attention(mesh, q, k, v, window, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
