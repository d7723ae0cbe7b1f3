"""Parity tests: scan-based LSTM/GRU vs torch's cuDNN-semantics reference.

torch (CPU) is available in the test environment, so the recurrence math is
checked directly against nn.LSTM/nn.GRU with packed sequences — the exact
code path the reference uses (models/NeuralArchitectures.py:83-131).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

from multimodaltopicsegmentation_tpu.ops import rnn as R
from multimodaltopicsegmentation_tpu.ops.masks import length_mask, reverse_in_length


def _copy_lstm_params(t_lstm, direction, layer=0):
    sfx = "_reverse" if direction == "bwd" else ""
    w_ih = getattr(t_lstm, f"weight_ih_l{layer}{sfx}").detach().numpy().T
    w_hh = getattr(t_lstm, f"weight_hh_l{layer}{sfx}").detach().numpy().T
    b = (
        getattr(t_lstm, f"bias_ih_l{layer}{sfx}").detach().numpy()
        + getattr(t_lstm, f"bias_hh_l{layer}{sfx}").detach().numpy()
    )
    return {
        "w_ih": jnp.asarray(w_ih),
        "w_hh": jnp.asarray(w_hh),
        "b": jnp.asarray(b),
    }


def _copy_gru_params(t_gru, direction, layer=0):
    sfx = "_reverse" if direction == "bwd" else ""
    return {
        "w_ih": jnp.asarray(getattr(t_gru, f"weight_ih_l{layer}{sfx}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(t_gru, f"weight_hh_l{layer}{sfx}").detach().numpy().T),
        "b_ih": jnp.asarray(getattr(t_gru, f"bias_ih_l{layer}{sfx}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(t_gru, f"bias_hh_l{layer}{sfx}").detach().numpy()),
    }


@pytest.mark.parametrize("seed", [0, 1])
def test_bilstm_matches_torch_packed(seed):
    torch.manual_seed(seed)
    B, L, D, H = 3, 11, 8, 6
    lengths = np.array([11, 7, 4])
    x = np.random.default_rng(seed).standard_normal((B, L, D)).astype(np.float32)

    t_lstm = nn.LSTM(D, H, batch_first=True, bidirectional=True)
    packed = pack_padded_sequence(
        torch.from_numpy(x), lengths.tolist(), batch_first=True, enforce_sorted=False
    )
    h0 = torch.zeros(2, B, H)
    c0 = torch.zeros(2, B, H)
    out, _ = t_lstm(packed, (h0, c0))
    t_out, _ = pad_packed_sequence(out, batch_first=True)
    t_out = t_out.detach().numpy()

    fwd = _copy_lstm_params(t_lstm, "fwd")
    bwd = _copy_lstm_params(t_lstm, "bwd")
    j_out = R.bidirectional_rnn(fwd, bwd, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(3)
    B, L, D, H = 2, 9, 5, 4
    lengths = np.array([9, 6])
    x = np.random.default_rng(3).standard_normal((B, L, D)).astype(np.float32)

    t_gru = nn.GRU(D, H, batch_first=True, bidirectional=True)
    packed = pack_padded_sequence(
        torch.from_numpy(x), lengths.tolist(), batch_first=True, enforce_sorted=False
    )
    h0 = torch.zeros(2, B, H)
    out, _ = t_gru(packed, h0)
    t_out, _ = pad_packed_sequence(out, batch_first=True)
    t_out = t_out.detach().numpy()

    fwd = _copy_gru_params(t_gru, "fwd")
    bwd = _copy_gru_params(t_gru, "bwd")
    j_out = R.bidirectional_rnn(fwd, bwd, jnp.asarray(x), jnp.asarray(lengths), cell="gru")
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)


def test_reverse_in_length():
    x = jnp.arange(2 * 5 * 1, dtype=jnp.float32).reshape(2, 5, 1)
    lengths = jnp.array([3, 5])
    r = reverse_in_length(x, lengths)
    np.testing.assert_array_equal(
        np.asarray(r[0, :, 0]), np.array([2.0, 1.0, 0.0, 3.0, 4.0])
    )
    np.testing.assert_array_equal(
        np.asarray(r[1, :, 0]), np.array([9.0, 8.0, 7.0, 6.0, 5.0])
    )


def test_length_mask():
    m = length_mask(jnp.array([2, 4]), 4)
    np.testing.assert_array_equal(
        np.asarray(m), np.array([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=np.float32)
    )


def test_init_shapes_and_forget_bias():
    p = R.lstm_params(jax.random.PRNGKey(0), 16, 8)
    assert p["w_ih"].shape == (16, 32)
    assert p["w_hh"].shape == (8, 32)
    # torch-parity split biases: forget-gate 1 lives on b_ih, b_hh all-zero
    np.testing.assert_array_equal(np.asarray(p["b_ih"][8:16]), np.ones(8, np.float32))
    np.testing.assert_array_equal(np.asarray(p["b_ih"][:8]), np.zeros(8, np.float32))
    np.testing.assert_array_equal(np.asarray(p["b_hh"]), np.zeros(32, np.float32))
    # orthogonality of recurrent weights (per 4 gate blocks it's one matrix)
    w = np.asarray(p["w_hh"])
    np.testing.assert_allclose(w @ w.T, np.eye(8) * (w @ w.T)[0, 0], atol=1e-4)
