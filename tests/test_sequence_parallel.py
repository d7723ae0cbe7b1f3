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

pytestmark = pytest.mark.slow  # sequence shard_map compiles dominate the suite


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


def test_sequence_sharded_transformer_decode_parity():
    """Full TransformerSegmenter decode with the unit axis sharded over the
    8-device mesh = single-device decode, bit-for-bit boundaries."""
    import jax.numpy as jnp

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.parallel.mesh import make_mesh
    from multimodaltopicsegmentation_tpu.parallel.sequence import (
        sequence_sharded_transformer_decode,
    )

    rng = np.random.default_rng(3)
    cfg = TaggerConfig(embedding_dim=32, hidden_dim=64, num_layers=2,
                       nheads=2, attention_window=8, loss_fn="FocalLoss")
    seg = build("Transformer", cfg)
    params = seg.init(jax.random.PRNGKey(0))

    mesh = make_mesh(8, model_parallel=1)
    B, L = 2, 256  # 32 units per shard; widest pyramidal window = 16
    x = jnp.asarray(rng.standard_normal((B, L, 32)), jnp.float32)
    lengths = jnp.asarray([256, 200])

    ref_scores, ref_tags = seg.decode(params, x, lengths, 0.5)
    with mesh:
        scores, tags = sequence_sharded_transformer_decode(
            mesh, seg, params, x, lengths, 0.5
        )
    # compare the VALID region only: positions beyond a document's length
    # are garbage in both paths (fully-masked attention rows) and nothing
    # downstream ever reads them (decode slices to lengths)
    for b, n in enumerate([256, 200]):
        np.testing.assert_allclose(
            np.asarray(scores)[b][:n], np.asarray(ref_scores)[b][:n],
            atol=2e-5, rtol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(tags)[b][:n], np.asarray(ref_tags)[b][:n]
        )


def test_sequence_sharded_transformer_window_guard():
    import jax.numpy as jnp

    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.parallel.mesh import make_mesh
    from multimodaltopicsegmentation_tpu.parallel.sequence import (
        sequence_sharded_transformer_decode,
    )

    cfg = TaggerConfig(embedding_dim=16, hidden_dim=32, num_layers=2,
                       nheads=2, attention_window=64, loss_fn="FocalLoss")
    seg = build("Transformer", cfg)
    params = seg.init(jax.random.PRNGKey(0))
    mesh = make_mesh(8, model_parallel=1)
    x = jnp.zeros((1, 64, 16))  # 8 units/shard < halo of the 128-wide layer
    with pytest.raises(AssertionError, match="widest window"):
        sequence_sharded_transformer_decode(mesh, seg, params, x,
                                            jnp.asarray([64]), 0.5)


def test_sequence_sharded_transformer_loss_and_grads_match_dense():
    """Training through the unit-sharded stack: loss and parameter
    gradients must match the dense single-device TransformerSegmenter
    (grad of the halo exchange = the reverse exchange; replicated param
    cotangents psum over shards via the shard_map transpose)."""
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.parallel.mesh import make_mesh
    from multimodaltopicsegmentation_tpu.parallel.sequence import (
        sequence_sharded_transformer_loss,
    )

    cfg = TaggerConfig(embedding_dim=16, hidden_dim=32, num_layers=2,
                       nheads=2, attention_window=4, loss_fn="FocalLoss")
    seg = build("Transformer", cfg)
    params = seg.init(jax.random.PRNGKey(0))
    mesh = make_mesh(4, model_parallel=1)

    rng = np.random.default_rng(1)
    B, L = 2, 64  # 16 units per shard, max pyramidal window 8 -> halo 4
    x = jnp.asarray(rng.standard_normal((B, L, 16)), jnp.float32)
    lengths = jnp.asarray([L, 50], jnp.int32)
    tags = jnp.asarray((rng.random((B, L)) < 0.2).astype(np.float32))

    ref_loss, ref_g = jax.value_and_grad(
        lambda p: seg.loss(p, x, lengths, tags)
    )(params)
    with mesh:
        sp_loss, sp_g = jax.jit(jax.value_and_grad(
            lambda p: sequence_sharded_transformer_loss(
                mesh, seg, p, x, lengths, tags
            )
        ))(params)

    np.testing.assert_allclose(float(sp_loss), float(ref_loss), atol=1e-6, rtol=1e-6)
    assert jax.tree.structure(ref_g) == jax.tree.structure(sp_g)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(sp_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-5)
