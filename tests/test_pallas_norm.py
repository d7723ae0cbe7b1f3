"""Fused instance-norm+GELU kernel vs the XLA reference path.

Runs the Pallas kernel in interpret mode on CPU (same convention as the
local-attention kernel tests); the real-TPU lowering is exercised by
scripts/tpu_smoke.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodaltopicsegmentation_tpu.encoders.wav2vec2 import _group_norm
from multimodaltopicsegmentation_tpu.ops.pallas_norm import pallas_instance_norm_gelu


@pytest.mark.parametrize("T", [24, 37])  # multiple of 8 and not
def test_pallas_instance_norm_gelu_matches_xla(T):
    rng = np.random.default_rng(0)
    B, C = 3, 256
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)

    ref = jax.nn.gelu(
        _group_norm({"scale": scale, "bias": bias}, x, groups=C),
        approximate=False,
    )
    got = pallas_instance_norm_gelu(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_pallas_norm_gate(monkeypatch):
    """The kernel is a measured opt-in: off without MTS_PALLAS_NORM=1, and
    even opted-in the CPU backend keeps the XLA path (exact parity tests
    elsewhere depend on it)."""
    from multimodaltopicsegmentation_tpu.encoders.wav2vec2 import _use_pallas_norm, Wav2Vec2Config

    cfg = Wav2Vec2Config.base()
    assert jax.default_backend() == "cpu"
    monkeypatch.delenv("MTS_PALLAS_NORM", raising=False)
    assert not _use_pallas_norm(512, cfg)  # not opted in
    monkeypatch.setenv("MTS_PALLAS_NORM", "1")
    assert not _use_pallas_norm(512, cfg)  # opted in, but CPU backend
