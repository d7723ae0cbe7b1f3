"""Local attention correctness: blocked / Pallas vs dense with a band mask."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.ops import attention as A
from multimodaltopicsegmentation_tpu.ops.pallas_attention import pallas_local_attention


def dense_banded_reference(q, k, v, window, mask):
    """Dense attention restricted to |i-j| <= window/2 — the semantic spec."""
    B, H, L, Dh = q.shape
    half = window // 2
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(Dh)
    pos = np.arange(L)
    band = np.abs(pos[None, :] - pos[:, None]) <= half
    scores = scores + jnp.asarray(np.where(band, 0.0, A.NEG_INF))
    scores = scores + (1.0 - mask[:, None, None, :]) * A.NEG_INF
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _rand_qkv(seed, B=2, H=2, L=37, Dh=8):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("window,L", [(4, 16), (8, 37), (16, 16), (6, 7)])
def test_blocked_local_matches_dense(window, L):
    q, k, v = _rand_qkv(0, L=L)
    B = q.shape[0]
    lengths = np.array([L, max(L - 5, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    ref = dense_banded_reference(q, k, v, window, mask)
    out = A.local_attention(q, k, v, window, mask, use_pallas=False)
    # compare only valid query positions
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, : lengths[b]],
            np.asarray(ref)[b, :, : lengths[b]],
            atol=1e-5,
        )


@pytest.mark.parametrize("window,L", [(4, 16), (8, 37)])
def test_pallas_kernel_matches_dense_interpret(window, L):
    q, k, v = _rand_qkv(1, L=L)
    B = q.shape[0]
    lengths = np.array([L, max(L - 3, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    ref = dense_banded_reference(q, k, v, window, mask)
    out = pallas_local_attention(q, k, v, window, mask, interpret=True)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, : lengths[b]],
            np.asarray(ref)[b, :, : lengths[b]],
            atol=1e-5,
        )


def test_t5_bucket_symmetric_properties():
    rel = jnp.asarray(np.arange(-20, 21))
    b = A.t5_relative_bucket(rel, num_buckets=32, max_distance=21)
    b = np.asarray(b)
    assert b[20] == 0  # rel 0
    # negative and positive offsets use distinct halves
    assert set(b[:20]) & set(b[21:]) == set()
    # monotone in |distance| within each side
    assert all(np.diff(b[21:]) >= 0)


def test_t5_bucket_matches_hf_exactly():
    """Bit-exact vs HF T5Attention._relative_position_bucket over a dense
    offset range and several (num_buckets, max_distance) — the truncation
    boundary is sensitive to any epsilon inside the log (a former +1e-6
    could flip a bucket where the ratio lands ~5e-6 below an integer)."""
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention

    for nb, md in ((32, 128), (32, 64), (16, 48), (64, 256)):
        rel = np.arange(-3 * md, 3 * md + 1)
        ours = np.asarray(A.t5_relative_bucket(rel, nb, md))
        hf = T5Attention._relative_position_bucket(
            torch.tensor(rel), bidirectional=True,
            num_buckets=nb, max_distance=md,
        ).numpy()
        np.testing.assert_array_equal(ours, hf, err_msg=f"{nb},{md}")


def test_relative_bias_fn_shape():
    table = jnp.asarray(np.random.default_rng(0).standard_normal((32, 4)), jnp.float32)
    fn = A.relative_bias_fn(table, 32, 16)
    rel = jnp.asarray(np.arange(-3, 4)[None, :] - np.zeros((5, 1), int))
    out = fn(rel)
    assert out.shape == (4, 5, 7)


def test_heads_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 9, 12)), jnp.float32)
    h = A.split_heads(x, 3)
    assert h.shape == (2, 3, 9, 4)
    np.testing.assert_allclose(np.asarray(A.merge_heads(h)), np.asarray(x))


@pytest.mark.parametrize("window,L", [(4, 16), (8, 37), (6, 7)])
def test_flash_forward_matches_dense_interpret(window, L):
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention,
    )

    q, k, v = _rand_qkv(2, L=L)
    B = q.shape[0]
    lengths = np.array([L, max(L - 3, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    ref = dense_banded_reference(q, k, v, window, mask)
    out = flash_local_attention(q, k, v, mask, window, True)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, : lengths[b]],
            np.asarray(ref)[b, :, : lengths[b]],
            atol=1e-5,
        )


@pytest.mark.parametrize("window,L", [(4, 16), (8, 37)])
def test_flash_grads_match_xla_path(window, L):
    """The custom backward pair must reproduce XLA autodiff of the blocked
    path exactly (through a length-masked loss, as every library loss is)."""
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention,
    )

    q, k, v = _rand_qkv(3, L=L)
    lengths = np.array([L, max(L - 5, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    m4 = mask[:, None, :, None]

    def loss_xla(q, k, v):
        o = A.local_attention(q, k, v, window, mask, use_pallas=False)
        return jnp.sum(jnp.sin(o) * m4)

    def loss_flash(q, k, v):
        o = flash_local_attention(q, k, v, mask, window, True)
        return jnp.sum(jnp.sin(o) * m4)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_flash_grad_accepts_nonfloat_mask():
    """Bool/int masks must take a float0 cotangent in the custom_vjp bwd —
    zeros of the primal dtype raise a TypeError at grad time, which only the
    TPU flash default path would hit (the XLA path grads fine)."""
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention,
    )

    window, L = 4, 16
    q, k, v = _rand_qkv(4, L=L)
    lengths = np.array([L, max(L - 3, 1)])
    for dt in (bool, np.int32):
        mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None]).astype(dt)
        fmask = mask.astype(q.dtype)

        def loss(q):
            o = flash_local_attention(q, k, v, mask, window, True)
            return jnp.sum(jnp.sin(o) * fmask[:, None, :, None])

        g = jax.grad(loss)(q)  # must not raise
        assert np.isfinite(np.asarray(g)).all()


def _biased_setup(seed, window, L, num_buckets=8):
    """qkv + prefix mask + a learnable T5-style bucket table and its
    bias_fn, plus the flash-geometry bias tile builder."""
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        _flash_geometry,
    )

    q, k, v = _rand_qkv(seed, L=L)
    H = q.shape[1]
    lengths = np.array([L, max(L - 5, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    rng = np.random.default_rng(seed + 100)
    table = jnp.asarray(rng.standard_normal((num_buckets, H)) * 0.1, jnp.float32)

    def bias_fn_of(tbl):
        return A.relative_bias_fn(tbl, num_buckets, window + 1)

    fblock = _flash_geometry(L, window // 2)[0]
    rel = jnp.asarray(
        np.arange(3 * fblock)[None, :] - fblock - np.arange(fblock)[:, None]
    )
    return q, k, v, mask, table, bias_fn_of, rel


@pytest.mark.parametrize("window,L,scale", [(4, 16, False), (8, 37, False),
                                            (8, 37, True)])
def test_flash_biased_forward_matches_xla(window, L, scale):
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention_biased,
    )

    q, k, v, mask, table, bias_fn_of, rel = _biased_setup(7, window, L)
    ref = A.local_attention(q, k, v, window, mask, bias_fn=bias_fn_of(table),
                            scale=scale, use_pallas=False)
    tile = bias_fn_of(table)(rel)
    out = flash_local_attention_biased(q, k, v, mask, tile, window, scale, True)
    lengths = np.sum(np.asarray(mask), axis=1).astype(int)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, : lengths[b]],
            np.asarray(ref)[b, :, : lengths[b]],
            atol=1e-5,
        )


@pytest.mark.parametrize("window,L", [(4, 16), (8, 37)])
def test_flash_biased_grads_match_xla_incl_bias_table(window, L):
    """dq/dk/dv AND the learnable bucket-table gradient (accumulated
    in-kernel over the h-major grid) must match XLA autodiff of the
    blocked path."""
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention_biased,
    )

    q, k, v, mask, table, bias_fn_of, rel = _biased_setup(8, window, L)
    m4 = mask[:, None, :, None]

    def loss_xla(q, k, v, tbl):
        o = A.local_attention(q, k, v, window, mask, bias_fn=bias_fn_of(tbl),
                              scale=False, use_pallas=False)
        return jnp.sum(jnp.sin(o) * m4)

    def loss_flash(q, k, v, tbl):
        tile = bias_fn_of(tbl)(rel)
        o = flash_local_attention_biased(q, k, v, mask, tile, window, False,
                                         True)
        return jnp.sum(jnp.sin(o) * m4)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


# ---------------------------------------------------------------------------
# Attention-probs dropout (HF semantics: drop the softmaxed weights)
# ---------------------------------------------------------------------------


def test_probs_dropout_inactive_without_rng_or_rate():
    q, k, v = _rand_qkv(0)
    mask = jnp.ones(q.shape[:1] + q.shape[2:3], q.dtype)
    base = A.local_attention(q, k, v, 8, mask, use_pallas=False)
    # rate without rng (eval) and rng with static-zero rate are both no-ops
    same1 = A.local_attention(q, k, v, 8, mask, use_pallas=False, probs_drop=0.5)
    same2 = A.local_attention(q, k, v, 8, mask, use_pallas=False,
                              probs_drop=0.0, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(same1), np.asarray(base))
    np.testing.assert_array_equal(np.asarray(same2), np.asarray(base))


def test_probs_dropout_active_changes_output_and_is_unbiased():
    q, k, v = _rand_qkv(1, L=64)
    mask = jnp.ones(q.shape[:1] + q.shape[2:3], q.dtype)
    base = A.local_attention(q, k, v, 8, mask, use_pallas=False)
    dropped = A.local_attention(q, k, v, 8, mask, use_pallas=False,
                                probs_drop=0.3, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(dropped), np.asarray(base))
    # survivors are rescaled by 1/keep: averaging over many keys recovers
    # the undropped output (tolerance is statistical)
    acc = np.zeros(np.asarray(base).shape, np.float64)
    n = 64
    for i in range(n):
        acc += np.asarray(
            A.local_attention(q, k, v, 8, mask, use_pallas=False,
                              probs_drop=0.3, rng=jax.random.PRNGKey(100 + i))
        )
    err = np.abs(acc / n - np.asarray(base))
    # per-element sampling noise at n=64 can reach ~0.4; the MEAN error
    # collapsing toward 0 is the unbiasedness check
    assert err.max() < 0.6 and err.mean() < 0.04, (err.max(), err.mean())


def test_probs_dropout_dense_matches_banded_semantics():
    q, k, v = _rand_qkv(2, L=16)
    mask = jnp.ones(q.shape[:1] + q.shape[2:3], q.dtype)
    d = A.dense_attention(q, k, v, mask, probs_drop=0.4,
                          rng=jax.random.PRNGKey(3))
    base = A.dense_attention(q, k, v, mask)
    assert not np.allclose(np.asarray(d), np.asarray(base))


def test_forced_fused_kernel_rejects_active_probs_dropout():
    """The OLD forward-only fused kernel (use_pallas=True) has no dropout
    support — forcing it under an active rate must fail loudly, not
    silently drop the regularizer."""
    q, k, v = _rand_qkv(3, L=32)
    mask = jnp.ones(q.shape[:1] + q.shape[2:3], q.dtype)
    with pytest.raises(AssertionError, match="probs dropout"):
        A.local_attention(q, k, v, 8, mask, use_pallas=True,
                          probs_drop=0.2, rng=jax.random.PRNGKey(0))


# The dropped flash pair draws its 0/1 mask with the SAME
# jax.random.bernoulli call as the XLA banded path's _drop_probs, so when
# the two block geometries coincide (window//2 a multiple of the sublane
# quantum 8) the same key gives BIT-IDENTICAL dropout — these parity tests
# pin that, making the kernels verifiable on CPU (interpret mode) against
# the path the rest of the suite already oracles.


@pytest.mark.parametrize("window,L", [(16, 37), (48, 64)])
def test_flash_dropped_forward_matches_xla_dropout(window, L):
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention_dropped,
    )

    q, k, v = _rand_qkv(11, L=L)
    lengths = np.array([L, max(L - 5, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    key = jax.random.PRNGKey(7)
    ref = A.local_attention(q, k, v, window, mask, use_pallas=False,
                            probs_drop=0.3, rng=key)
    out = flash_local_attention_dropped(q, k, v, mask, key, window, 0.3, True)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, : lengths[b]],
            np.asarray(ref)[b, :, : lengths[b]],
            atol=1e-5,
        )


@pytest.mark.parametrize("window,L", [(16, 37)])
def test_flash_dropped_grads_match_xla_dropout(window, L):
    """The backward pair REGENERATES the mask from the key — dq/dk/dv must
    match XLA autodiff of the banded path under the identical draw."""
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention_dropped,
    )

    q, k, v = _rand_qkv(12, L=L)
    lengths = np.array([L, max(L - 5, 1)])
    mask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
    m4 = mask[:, None, :, None]
    key = jax.random.PRNGKey(9)

    def loss_xla(q, k, v):
        o = A.local_attention(q, k, v, window, mask, use_pallas=False,
                              probs_drop=0.25, rng=key)
        return jnp.sum(jnp.sin(o) * m4)

    def loss_flash(q, k, v):
        o = flash_local_attention_dropped(q, k, v, mask, key, window, 0.25,
                                          True)
        return jnp.sum(jnp.sin(o) * m4)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_flash_biased_dropped_matches_xla_incl_bias_grad():
    """T5-family: bias tile + probs dropout together; forward AND the
    dq/dk/dv/bucket-table grads must match the banded path."""
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention_biased_dropped,
    )

    window, L = 16, 37
    q, k, v, mask, table, bias_fn_of, rel = _biased_setup(13, window, L)
    m4 = mask[:, None, :, None]
    key = jax.random.PRNGKey(21)

    ref = A.local_attention(q, k, v, window, mask, bias_fn=bias_fn_of(table),
                            scale=False, use_pallas=False, probs_drop=0.3,
                            rng=key)
    out = flash_local_attention_biased_dropped(
        q, k, v, mask, bias_fn_of(table)(rel), key, window, 0.3, False, True)
    lengths = np.sum(np.asarray(mask), axis=1).astype(int)
    for b in range(q.shape[0]):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, : lengths[b]],
            np.asarray(ref)[b, :, : lengths[b]],
            atol=1e-5,
        )

    def loss_xla(q, k, v, tbl):
        o = A.local_attention(q, k, v, window, mask, bias_fn=bias_fn_of(tbl),
                              scale=False, use_pallas=False, probs_drop=0.3,
                              rng=key)
        return jnp.sum(jnp.sin(o) * m4)

    def loss_flash(q, k, v, tbl):
        o = flash_local_attention_biased_dropped(
            q, k, v, mask, bias_fn_of(tbl)(rel), key, window, 0.3, False,
            True)
        return jnp.sum(jnp.sin(o) * m4)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


@pytest.mark.parametrize("variant", ["plain", "biased"])
def test_flash_dropped_non_coinciding_geometry_self_consistent(variant):
    """window 24: half-window 12 rounds to flash block 16 while the XLA
    banded path blocks at 12, so the two paths draw DIFFERENT dropout masks
    and bit-parity cannot hold (it only can when window//2 is a multiple of
    the sublane quantum 8). What must still hold is the pair's own
    fwd/bwd consistency — the backward regenerates the forward's exact
    mask from the key — which a finite-difference gradient check pins."""
    from jax.test_util import check_grads
    from multimodaltopicsegmentation_tpu.ops.pallas_attention import (
        flash_local_attention_biased_dropped,
        flash_local_attention_dropped,
    )

    window, L = 24, 40
    key = jax.random.PRNGKey(17)
    if variant == "plain":
        q, k, v = _rand_qkv(14, L=L)
        lengths = np.array([L, L - 7])
        mask = jnp.asarray(
            (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32))
        m4 = mask[:, None, :, None]

        def f(q, k, v):
            o = flash_local_attention_dropped(q, k, v, mask, key, window,
                                              0.3, True)
            return jnp.sum(jnp.sin(o) * m4)

        args = (q, k, v)
    else:
        q, k, v, mask, table, bias_fn_of, rel = _biased_setup(15, window, L)
        m4 = mask[:, None, :, None]

        def f(q, k, v, tbl):
            o = flash_local_attention_biased_dropped(
                q, k, v, mask, bias_fn_of(tbl)(rel), key, window, 0.3,
                False, True)
            return jnp.sum(jnp.sin(o) * m4)

        args = (q, k, v, table)

    assert np.isfinite(float(f(*args)))
    check_grads(f, args, order=1, modes=["rev"], atol=2e-2, rtol=2e-2)
