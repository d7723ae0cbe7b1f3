"""North-star check: identical boundary predictions vs a torch reference
model with the same weights (BASELINE.md correctness target)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build


class TorchBiLSTM(nn.Module):
    """The reference's BiLSTM tagger compute path (models/CRF.py:274-369)."""

    def __init__(self, D, H, layers):
        super().__init__()
        self.rnn = nn.LSTM(D, H, num_layers=layers, batch_first=True, bidirectional=True)
        self.cls = nn.Linear(2 * H, 1)

    def forward(self, x, lengths):
        packed = pack_padded_sequence(x, lengths, batch_first=True, enforce_sorted=False)
        h0 = torch.zeros(2 * self.rnn.num_layers, x.shape[0], self.rnn.hidden_size)
        out, _ = self.rnn(packed, (h0, h0.clone()))
        out, _ = pad_packed_sequence(out, batch_first=True, total_length=x.shape[1])
        return self.cls(out)


def _convert(tm: TorchBiLSTM, layers, H):
    params = {"rnn": [], "cls": None}
    for layer in range(layers):
        entry = {}
        for direction, key in (("", "fwd"), ("_reverse", "bwd")):
            entry[key] = {
                "w_ih": jnp.asarray(
                    getattr(tm.rnn, f"weight_ih_l{layer}{direction}").detach().numpy().T
                ),
                "w_hh": jnp.asarray(
                    getattr(tm.rnn, f"weight_hh_l{layer}{direction}").detach().numpy().T
                ),
                "b": jnp.asarray(
                    (
                        getattr(tm.rnn, f"bias_ih_l{layer}{direction}")
                        + getattr(tm.rnn, f"bias_hh_l{layer}{direction}")
                    ).detach().numpy()
                ),
            }
        params["rnn"].append(entry)
    params["cls"] = {
        "w": jnp.asarray(tm.cls.weight.detach().numpy().T),
        "b": jnp.asarray(tm.cls.bias.detach().numpy()),
    }
    return params


@pytest.mark.parametrize("layers", [1, 2])
@pytest.mark.slow
def test_identical_boundary_predictions(layers):
    torch.manual_seed(0)
    D, H = 24, 16
    B, L = 4, 60
    tm = TorchBiLSTM(D, H, layers).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([60, 51, 44, 37])

    with torch.no_grad():
        scores_t = tm(torch.from_numpy(x), lengths.tolist())
        probs_t = torch.sigmoid(scores_t)[:, :, 0].numpy()

    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=H, num_layers=layers, loss_fn="FocalLoss"
    )
    model = build("BiLSTM", cfg)
    params = _convert(tm, layers, H)

    for threshold in (0.3, 0.4, 0.5):
        _scores, tags = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), threshold)
        tags = np.asarray(tags)
        ref_tags = probs_t > threshold
        for b, Lb in enumerate(lengths):
            np.testing.assert_array_equal(
                tags[b][:Lb], ref_tags[b][:Lb],
                err_msg=f"threshold {threshold}, doc {b}",
            )

    # scores themselves match to float32 tolerance
    scores_j, _ = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.5)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb, 0], scores_t[:, :, 0].numpy()[b, :Lb], atol=1e-5
        )
