"""Reference-checkpoint interoperability.

Builds torch models with the reference TextSegmenter's exact state_dict
layout (/root/reference/models/lightning_model.py:178-250 wrapping
models/CRF.py taggers and the NeuralArchitectures.RNN wrapper), saves a
torch checkpoint, converts it with tools/convert_reference_checkpoint.py,
and asserts boundary-identical decodes — including end to end through
cli/predict.py (the round-1 gap: a user holding reference-trained weights
could not run them here).
"""
import os
import pickle
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_reference_checkpoint import (  # noqa: E402
    convert_checkpoint,
    convert_state_dict,
    infer_architecture,
)

from multimodaltopicsegmentation_tpu.models.registry import build  # noqa: E402

IMPOSSIBLE = -1e4


# ---- torch stand-ins with the reference's exact module attribute names ----
class RefRNN(nn.Module):
    """NeuralArchitectures.RNN layout: the recurrent module is `.rnn`, run
    over packed sequences (models/NeuralArchitectures.py:96-131)."""

    def __init__(self, D, H, layers, bidirectional=True, lstm=True):
        super().__init__()
        cls = nn.LSTM if lstm else nn.GRU
        self.rnn = cls(D, H, num_layers=layers, batch_first=True,
                       bidirectional=bidirectional)

    def forward(self, x, lengths):
        from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

        packed = pack_padded_sequence(x, lengths, batch_first=True, enforce_sorted=False)
        out, _ = self.rnn(packed)
        out, _ = pad_packed_sequence(out, batch_first=True, total_length=x.shape[1])
        return out


class RefBiLSTM(nn.Module):
    """models/CRF.py BiLSTM layout: `.model` (RNN) + `.classification`."""

    def __init__(self, D, H, layers, out=1, lstm=True):
        super().__init__()
        self.model = RefRNN(D, H, layers, lstm=lstm)
        self.classification = nn.Linear(2 * H, out)

    def forward(self, x, lengths):
        return self.classification(self.model(x, lengths))


class RefLateFusion(nn.Module):
    """models/CRF.py BiLSTMLateFusion layout: `.model1`/`.model2`/`.classification`."""

    def __init__(self, D1, D2, H, layers, out=1):
        super().__init__()
        self.model1 = RefRNN(D1, H, layers)
        self.model2 = RefRNN(D2, H, layers)
        self.classification = nn.Linear(4 * H, out)

    def forward(self, x1, x2, lengths):
        return self.classification(
            torch.cat([self.model1(x1, lengths), self.model2(x2, lengths)], -1)
        )


class RefCRF(nn.Module):
    """models/CRF.py CRF layout: `.fc` + `.transitions` (T[i,j] = j -> i)."""

    def __init__(self, in_features, num_tags):
        super().__init__()
        C = num_tags + 2
        self.fc = nn.Linear(in_features, C)
        self.transitions = nn.Parameter(torch.randn(C, C))
        with torch.no_grad():
            self.transitions[C - 2, :] = IMPOSSIBLE
            self.transitions[:, C - 1] = IMPOSSIBLE


class RefBiRnnCrf(nn.Module):
    def __init__(self, D, H, layers, num_tags=2):
        super().__init__()
        self.model = RefRNN(D, H, layers)
        self.crf = RefCRF(2 * H, num_tags)


def _lightning_ckpt(module: nn.Module, path: str):
    """TextSegmenter wraps the tagger as `self.model`, so every state_dict
    key gets the 'model.' prefix; Lightning stores it under 'state_dict'."""
    sd = {"model." + k: v for k, v in module.state_dict().items()}
    torch.save({"state_dict": sd, "hyper_parameters": {}}, path)


def _ref_viterbi(features, trans, lengths):
    """The reference's __viterbi_decode semantics in numpy
    (/root/reference/models/CRF.py:172-216)."""
    B, L, C = features.shape
    start, stop = C - 2, C - 1
    paths = []
    for b in range(B):
        n = int(lengths[b])
        max_score = np.full(C, IMPOSSIBLE)
        max_score[start] = 0.0
        bps = np.zeros((n, C), int)
        for t in range(n):
            acc = max_score[None, :] + trans  # [C(to), C(from)]
            bps[t] = acc.argmax(-1)
            max_score = acc.max(-1) + features[b, t]
        max_score = max_score + trans[stop]
        tag = int(max_score.argmax())
        path = [tag]
        for t in range(n - 1, -1, -1):
            tag = int(bps[t][tag])
            path.append(tag)
        paths.append(path[-2::-1])
    return paths


@pytest.mark.parametrize("out,loss", [(1, "BinaryCrossEntropy"), (2, "CrossEntropy")])
def test_convert_bilstm_identical_boundaries(tmp_path, rng, out, loss):
    torch.manual_seed(0)
    D, H, layers, B, L = 12, 8, 2, 3, 40
    tm = RefBiLSTM(D, H, layers, out=out).eval()
    ckpt = str(tmp_path / "ref.ckpt")
    _lightning_ckpt(tm, ckpt)

    params, cfg, arch = convert_checkpoint(ckpt, str(tmp_path / "fw.ckpt"))
    assert arch == "BiLSTM" and cfg.loss_fn == loss
    assert cfg.hidden_dim == H and cfg.num_layers == layers and cfg.embedding_dim == D

    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([L, L - 7, L - 15])
    with torch.no_grad():
        logits = tm(torch.from_numpy(x), lengths.tolist())
        if out == 1:
            probs = torch.sigmoid(logits)[:, :, 0].numpy()
        else:
            probs = torch.softmax(logits, -1)[:, :, 1].numpy()

    model = build(arch, cfg)
    for th in (0.3, 0.5):
        _s, tags = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), th)
        tags = np.asarray(tags)
        for b, n in enumerate(lengths):
            np.testing.assert_array_equal(tags[b][:n], probs[b][:n] > th)


def test_convert_gru_bilstm(tmp_path, rng):
    """GRU bias handling: torch keeps b_ih/b_hh separate (the candidate gate
    applies b_hh inside the reset product) — the converter must not sum them."""
    torch.manual_seed(1)
    D, H, B, L = 10, 6, 2, 25
    tm = RefBiLSTM(D, H, 1, out=1, lstm=False).eval()
    ckpt = str(tmp_path / "ref.ckpt")
    _lightning_ckpt(tm, ckpt)
    params, cfg, arch = convert_checkpoint(ckpt, str(tmp_path / "fw.ckpt"))
    assert not cfg.lstm

    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([L, L - 5])
    with torch.no_grad():
        probs = torch.sigmoid(tm(torch.from_numpy(x), lengths.tolist()))[:, :, 0].numpy()
    model = build(arch, cfg)
    scores, tags = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.5)
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(
            1 / (1 + np.exp(-np.asarray(scores)[b, :n, 0])), probs[b][:n], atol=1e-5
        )


def test_convert_latefusion_identical_boundaries(tmp_path, rng):
    torch.manual_seed(2)
    D1, D2, H, B, L = 9, 7, 8, 2, 30
    tm = RefLateFusion(D1, D2, H, 1).eval()
    ckpt = str(tmp_path / "ref.ckpt")
    _lightning_ckpt(tm, ckpt)
    params, cfg, arch = convert_checkpoint(ckpt, str(tmp_path / "fw.ckpt"))
    assert arch == "BiLSTMLateFusion"
    assert cfg.embedding_dim == D1 and cfg.embedding_dim2 == D2

    x1 = rng.standard_normal((B, L, D1)).astype(np.float32)
    x2 = rng.standard_normal((B, L, D2)).astype(np.float32)
    lengths = np.array([L, L - 11])
    with torch.no_grad():
        probs = torch.sigmoid(tm(torch.from_numpy(x1), torch.from_numpy(x2), lengths.tolist()))[:, :, 0].numpy()
    model = build(arch, cfg)
    _s, tags = model.decode(
        params, jnp.asarray(x1), jnp.asarray(lengths), 0.5, x2=jnp.asarray(x2)
    )
    tags = np.asarray(tags)
    for b, n in enumerate(lengths):
        np.testing.assert_array_equal(tags[b][:n], probs[b][:n] > 0.5)


def test_convert_birnncrf_identical_paths(tmp_path, rng):
    torch.manual_seed(3)
    D, H, B, L = 8, 6, 3, 20
    tm = RefBiRnnCrf(D, H, 1).eval()
    ckpt = str(tmp_path / "ref.ckpt")
    _lightning_ckpt(tm, ckpt)
    params, cfg, arch = convert_checkpoint(ckpt, str(tmp_path / "fw.ckpt"))
    assert arch == "biLSTMCRF" and cfg.tagset_size == 2

    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([L, L - 6, L - 12])
    with torch.no_grad():
        h = tm.model(torch.from_numpy(x), lengths.tolist())
        feats = tm.crf.fc(h).numpy()
    ref_paths = _ref_viterbi(feats, tm.crf.transitions.detach().numpy(), lengths)

    model = build(arch, cfg)
    _score, tags = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), None)
    tags = np.asarray(tags).astype(int)
    for b, n in enumerate(lengths):
        np.testing.assert_array_equal(tags[b][:n], np.asarray(ref_paths[b]))


def test_infer_architecture():
    tm = RefBiRnnCrf(4, 4, 1)
    assert infer_architecture(tm.state_dict()) == "biLSTMCRF"
    tm = RefLateFusion(4, 4, 4, 1)
    assert infer_architecture(tm.state_dict()) == "BiLSTMLateFusion"
    tm = RefBiLSTM(4, 4, 1)
    assert infer_architecture(tm.state_dict()) == "BiLSTM"


def test_predict_cli_loads_reference_checkpoint(tmp_path, rng):
    """End to end: a raw torch TextSegmenter checkpoint + results.txt drive
    cli/predict.py and produce the torch model's exact boundaries."""
    torch.manual_seed(4)
    D, H, layers = 30, 8, 1
    tm = RefBiLSTM(D, H, layers, out=1).eval()
    ckpt = str(tmp_path / "best_model")
    _lightning_ckpt(tm, ckpt)

    from tests.synth import make_synthetic_corpus

    emb_dir, _lab, _split = make_synthetic_corpus(str(tmp_path / "c"), n_docs=6, dim=D)

    results_txt = tmp_path / "results.txt"
    results_txt.write_text(
        "Sentence encoder: CNN\nNeural architecture: BiLSTM\n"
        f"Hidden units: {H}\nNumber of layers: {layers}\n"
    )
    import multimodaltopicsegmentation_tpu.cli.predict as P

    if ("CNN", D) not in P.ENCODER_DIMS:
        P.ENCODER_DIMS.append(("CNN", D))

    pred = P.Predictor(str(results_txt), ckpt, threshold=0.5)
    exp = str(tmp_path / "pexp")
    results = pred.predict(emb_dir, exp, write_audio_segments=False, batch_size=4)
    assert len(results) == 6

    with open(os.path.join(exp, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    for name, tags in res.items():
        emb = np.load(os.path.join(emb_dir, name)).astype(np.float32)
        with torch.no_grad():
            probs = torch.sigmoid(tm(torch.from_numpy(emb[None]), [len(emb)]))[0, :, 0].numpy()
        np.testing.assert_array_equal(np.asarray(tags, bool), probs > 0.5)


class RefSimpleBiLSTM(nn.Module):
    """models/CRF.py SimpleBiLSTM layout: bare `.lstm` + `.classifier`."""

    def __init__(self, D, H, layers=1):
        super().__init__()
        self.lstm = nn.LSTM(D, H, layers, bidirectional=True, batch_first=True)
        self.classifier = nn.Linear(2 * H, 1)


def test_convert_simple_bilstm(tmp_path, rng):
    torch.manual_seed(5)
    D, H, B, L = 11, 7, 2, 22
    tm = RefSimpleBiLSTM(D, H).eval()
    ckpt = str(tmp_path / "ref.ckpt")
    _lightning_ckpt(tm, ckpt)
    assert infer_architecture(tm.state_dict()) == "SimpleBiLSTM"
    params, cfg, arch = convert_checkpoint(ckpt, str(tmp_path / "fw.ckpt"))
    assert arch == "SimpleBiLSTM" and cfg.hidden_dim == H

    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([L, L - 9])
    from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

    with torch.no_grad():
        packed = pack_padded_sequence(torch.from_numpy(x), lengths.tolist(),
                                      batch_first=True, enforce_sorted=False)
        out, _ = tm.lstm(packed)
        out, _ = pad_packed_sequence(out, batch_first=True, total_length=L)
        probs = torch.sigmoid(tm.classifier(out))[:, :, 0].numpy()

    model = build(arch, cfg)
    _s, tags = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    tags = np.asarray(tags)
    for b, n in enumerate(lengths):
        np.testing.assert_array_equal(tags[b][:n], probs[b][:n] > 0.4)


def test_convert_unidirectional_lstm(tmp_path, rng):
    """The reference predict's 'LSTM' architecture = BiLSTM layout with
    bidirectional=False (predict.py:220-221)."""
    torch.manual_seed(6)
    D, H, B, L = 10, 6, 2, 18

    class RefLSTM(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = RefRNN(D, H, 1, bidirectional=False)
            self.classification = nn.Linear(H, 1)

    tm = RefLSTM().eval()
    ckpt = str(tmp_path / "ref.ckpt")
    _lightning_ckpt(tm, ckpt)
    params, cfg, arch = convert_checkpoint(ckpt, str(tmp_path / "fw.ckpt"))
    assert arch == "BiLSTM" and not cfg.bidirectional

    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([L, L - 5])
    with torch.no_grad():
        h = tm.model(torch.from_numpy(x), lengths.tolist())
        probs = torch.sigmoid(tm.classification(h))[:, :, 0].numpy()
    model = build(arch, cfg)
    _s, tags = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.5)
    tags = np.asarray(tags)
    for b, n in enumerate(lengths):
        np.testing.assert_array_equal(tags[b][:n], probs[b][:n] > 0.5)


def test_predict_rejects_multi_input_architectures(tmp_path):
    """Architectures needing extra per-document inputs must fail clearly
    BEFORE any embedding extraction (reference gates them the same way,
    predict.py:218-225)."""
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
    from multimodaltopicsegmentation_tpu.models.registry import build
    from multimodaltopicsegmentation_tpu.train import checkpoints as ckpt_lib
    import multimodaltopicsegmentation_tpu.cli.predict as P

    cfg = TaggerConfig(embedding_dim=8, hidden_dim=4, num_layers=1,
                       loss_fn="FocalLoss")
    arch = build("SwitchBiLSTM", cfg)
    ckpt = str(tmp_path / "best_model")
    ckpt_lib.save(ckpt, arch.init(jax.random.PRNGKey(0)), cfg, "SwitchBiLSTM")
    results_txt = tmp_path / "results.txt"
    results_txt.write_text(
        "Sentence encoder: mfcc\nNeural architecture: SwitchBiLSTM\n"
        "Hidden units: 4\nNumber of layers: 1\n"
    )
    with pytest.raises(NotImplementedError, match="SwitchBiLSTM"):
        P.Predictor(str(results_txt), ckpt, threshold=0.5)
