"""Parity against the reference's ACTUAL code, not replicas of it.

Every other parity test in this suite compares against an in-tree torch
re-implementation of the reference modules.  This module instead imports the
real classes from /root/reference (never copying them), transplants their
weights into the framework via the production converter
(tools/convert_reference_checkpoint.convert_state_dict), and asserts
boundary-identical decode and matching loss values on CPU.

The only scaffolding needed to execute the reference in this image is a
stub for `models.longformer_noffn`, which ships as .pyc only
(/root/reference/models/__pycache__ — Python 3.8/3.10 bytecode, unloadable
under 3.12). The stub is FUNCTIONAL: HF's own LongformerSelfAttention in
exactly the glue recovered from the 3.10 bytecode by tools/pyc310.py, each
behavior pinned in tests/test_reference_pyc_glue.py — so even the
RecurrentLongformer family runs the reference's own CRF.py end to end.

Reference defects worked around here (each documented at its test; see
SURVEY.md §7 "Known reference defects"):
- BiRnnCrf.loss/forward unpack one tensor into two (models/CRF.py:263,271)
  -> the CRF layer is driven directly through its submodules.
- MLP.forward / SimpleBiLSTM.forward / SheikhBiLSTM.forward read an unset
  `self.th` (models/CRF.py:887,972,1036) -> `ref.th = None` is set.
- SwitchBiLSTM with a MIXED-domain batch is broken in both modes
  ('lstm' passes a python list where RNN expects a tensor,
  models/CRF.py:1146; 'dense' regroups rows of the full-batch projection
  by group-local index, models/CRF.py:1197-1200) -> parity is asserted on
  pure-domain batches, the only batches the reference executes correctly.
"""
import dataclasses
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch

from multimodaltopicsegmentation_tpu.models.base import TaggerConfig
from multimodaltopicsegmentation_tpu.models.registry import build
from multimodaltopicsegmentation_tpu.ops import losses as losses_lib
from multimodaltopicsegmentation_tpu.ops import rnn as rnn_lib
from multimodaltopicsegmentation_tpu.ops.masks import length_mask
from multimodaltopicsegmentation_tpu.tools.convert_reference_checkpoint import (
    convert_state_dict,
)

REF = "/root/reference"


from tests.reference_stub import make_noffn_stub


@pytest.fixture(scope="module")
def ref():
    """Import the reference's real model modules (read-only, never copied)."""
    if "models.longformer_noffn" not in sys.modules:
        # functional, bytecode-receipted stub shared with the data-oracle
        # file — see tests/reference_stub.py for why they must agree
        sys.modules["models.longformer_noffn"] = make_noffn_stub()
    sys.path.insert(0, REF)
    try:
        import importlib

        crf = importlib.import_module("models.CRF")
        na = importlib.import_module("models.NeuralArchitectures")
        fl = importlib.import_module("models.focal_loss")
    finally:
        sys.path.remove(REF)
    assert crf.__file__.startswith(REF), crf.__file__
    return types.SimpleNamespace(CRF=crf, NA=na, focal=fl)


def transplant(ref_module, architecture=None):
    """reference nn.Module -> (framework params, TaggerConfig, arch name).

    Keys are prefixed with 'model.' to present the TextSegmenter checkpoint
    layout the production converter consumes (lightning_model.py wraps every
    tagger as `self.model`)."""
    sd = {f"model.{k}": v for k, v in ref_module.state_dict().items()}
    params, cfg, arch = convert_state_dict(sd, architecture)
    return jax.tree_util.tree_map(jnp.asarray, params), cfg, arch


def batch(rng, B=4, L=40, D=12, lengths=(40, 33, 21, 17), ce=False):
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.asarray(lengths, np.int64)
    tags = (rng.random((B, L)) < 0.2).astype(np.float32)
    pad = np.arange(L)[None, :] >= lengths[:, None]
    if ce:
        tags = np.where(pad, -1.0, tags)  # CE ignore_index convention
    else:
        tags = np.where(pad, 0.0, tags)
    return x, lengths, tags


def assert_boundaries_identical(fw_tags, ref_tag_lists, lengths):
    fw = np.asarray(fw_tags)
    for b, ref_list in enumerate(ref_tag_lists):
        got = fw[b][: len(ref_list)].astype(int).tolist()
        want = [int(v) for v in ref_list]
        assert got == want, f"doc {b}: {got} != {want}"


# ---------------------------------------------------------------------------
# focal loss — the exact callable every paper config trains with
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("alpha,gamma", [(0.9, 2.0), (0.25, 2.0), (-1.0, 1.0)])
def test_focal_loss_matches_reference(ref, rng, alpha, gamma):
    logits = rng.standard_normal(64).astype(np.float32) * 3
    targets = (rng.random(64) < 0.3).astype(np.float32)
    ref_fn = ref.focal.sigmoid_focal_loss(alpha=alpha, gamma=gamma, reduction="mean")
    want = ref_fn(torch.from_numpy(logits), torch.from_numpy(targets)).item()
    got = losses_lib.sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), jnp.ones(64), alpha, gamma
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


# ---------------------------------------------------------------------------
# the RNN wrapper itself (models/NeuralArchitectures.py:23-145)
# ---------------------------------------------------------------------------

def test_rnn_wrapper_unidirectional_gru(ref, rng):
    """The reference's GRU path is only executable unidirectionally (the
    bidirectional branch hands nn.GRU an LSTM-style state tuple,
    NeuralArchitectures.py:113); parity is on the working path."""
    D, H = 10, 7
    tm = ref.NA.RNN(D, H, num_layers=1, bidirectional=False, LSTM=False).eval()
    x, lengths, _ = batch(rng, D=D)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # no lengths: unpadded path
    sd = tm.state_dict()
    p = {
        "w_ih": jnp.asarray(sd["rnn.weight_ih_l0"].numpy().T),
        "w_hh": jnp.asarray(sd["rnn.weight_hh_l0"].numpy().T),
        "b_ih": jnp.asarray(sd["rnn.bias_ih_l0"].numpy()),
        "b_hh": jnp.asarray(sd["rnn.bias_hh_l0"].numpy()),
    }
    got = rnn_lib.unidirectional_rnn(p, jnp.asarray(x), None, "gru")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


# ---------------------------------------------------------------------------
# BiLSTM (models/CRF.py:274-369) — the paper's workhorse
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loss_fn", ["CrossEntropy", "BinaryCrossEntropy", "FocalLoss"])
@pytest.mark.parametrize("layers", [1, 2])
def test_bilstm_decode_and_loss(ref, rng, loss_fn, layers):
    torch.manual_seed(3)
    D, H = 12, 8
    tm = ref.CRF.BiLSTM(
        2, D, H, num_layers=layers, loss_fn=loss_fn, device="cpu"
    ).eval()
    params, cfg, arch = transplant(tm)
    assert arch == "BiLSTM"
    assert cfg.hidden_dim == H and cfg.num_layers == layers
    # FocalLoss and BinaryCrossEntropy share the width-1 head, so the
    # converter (correctly) cannot tell them apart from shapes alone and
    # defaults to BCE — decode is identical either way; for LOSS parity the
    # training-time loss must be re-declared, as the reference CLI does via
    # its -loss flag (train_fit.py:713)
    cfg = dataclasses.replace(cfg, loss_fn=loss_fn)
    model = build(arch, cfg)

    x, lengths, tags = batch(rng, D=D, ce=loss_fn == "CrossEntropy")
    lt = torch.from_numpy(lengths)

    for threshold in (0.3, 0.4, 0.5):
        with torch.no_grad():
            scores_t, ref_tags = tm(torch.from_numpy(x), lt, threshold)
        scores_j, tags_j = model.decode(
            params, jnp.asarray(x), jnp.asarray(lengths), threshold
        )
        assert_boundaries_identical(tags_j, ref_tags, lengths)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=1e-5
        )

    with torch.no_grad():
        want = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags)).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# BiLSTMLateFusion (models/CRF.py:371-479)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loss_fn", ["FocalLoss", "CrossEntropy"])
def test_latefusion_decode_and_loss(ref, rng, loss_fn):
    torch.manual_seed(4)
    D1, D2, H = 12, 9, 8
    tm = ref.CRF.BiLSTMLateFusion(
        2, (D1, D2), H, num_layers=1, loss_fn=loss_fn, device="cpu"
    ).eval()
    params, cfg, arch = transplant(tm)
    assert arch == "BiLSTMLateFusion"
    assert (cfg.embedding_dim, cfg.embedding_dim2) == (D1, D2)
    cfg = dataclasses.replace(cfg, loss_fn=loss_fn)
    model = build(arch, cfg)

    x1, lengths, tags = batch(rng, D=D1, ce=loss_fn == "CrossEntropy")
    x2 = rng.standard_normal((4, 40, D2)).astype(np.float32)
    lt = torch.from_numpy(lengths)

    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x1), torch.from_numpy(x2), lt, 0.4)
    scores_j, tags_j = model.decode(
        params, jnp.asarray(x1), jnp.asarray(lengths), 0.4, x2=jnp.asarray(x2)
    )
    assert_boundaries_identical(tags_j, ref_tags, lengths)

    with torch.no_grad():
        want = tm.loss(
            torch.from_numpy(x1), torch.from_numpy(x2), lt, torch.from_numpy(tags)
        ).item()
    got = model.loss(
        params, jnp.asarray(x1), jnp.asarray(lengths), jnp.asarray(tags),
        x2=jnp.asarray(x2),
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# BiRnnCrf (models/CRF.py:243-272) — driven through its submodules because
# its own loss/forward unpack one tensor into two (the :263 defect)
# ---------------------------------------------------------------------------

def test_birnncrf_loss_and_viterbi(ref, rng):
    torch.manual_seed(5)
    D, H = 12, 8
    tm = ref.CRF.BiRnnCrf(2, D, H, num_layers=1).eval()
    tm.device = "cpu"
    params, cfg, arch = transplant(tm)
    assert arch == "biLSTMCRF"
    model = build(arch, cfg)

    x, lengths, tags = batch(rng, D=D)
    lt = torch.from_numpy(lengths)
    masks = ref.CRF.create_mask(torch.from_numpy(x), lt)

    with torch.no_grad():
        features = tm.model(torch.from_numpy(x), lt)
        want_loss = tm.crf.loss(features, torch.from_numpy(tags), masks=masks).item()
        want_score, want_paths = tm.crf(features, masks)

    got_loss = model.loss(
        params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags)
    )
    np.testing.assert_allclose(float(got_loss), want_loss, rtol=2e-5)

    got_score, got_paths = model.decode(params, jnp.asarray(x), jnp.asarray(lengths))
    assert_boundaries_identical(got_paths, want_paths, lengths)
    np.testing.assert_allclose(
        np.asarray(got_score), want_score.numpy(), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# SimpleBiLSTM (models/CRF.py:895-977) and MLP (:860-892)
# ---------------------------------------------------------------------------

def test_simple_bilstm(ref, rng):
    torch.manual_seed(6)
    D, H = 12, 8
    tm = ref.CRF.SimpleBiLSTM(D, H, layers=1).eval()
    tm.th = None  # reference forward reads an attribute __init__ never sets
    params, cfg, arch = transplant(tm)
    assert arch == "SimpleBiLSTM"
    model = build(arch, cfg)

    # full lengths: the reference's BCE scores padding too, ours masks it —
    # they only agree when there is no padding
    x, lengths, tags = batch(rng, D=D, lengths=(40, 40, 40, 40))
    lt = torch.from_numpy(lengths)

    with torch.no_grad():
        want = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags)).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)

    with torch.no_grad():
        _, ref_tags = tm(torch.from_numpy(x), lt, 0.4)
    _, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    assert_boundaries_identical(tags_j, ref_tags, lengths)


def test_mlp(ref, rng):
    torch.manual_seed(7)
    D, H = 12, 8
    tm = ref.CRF.MLP(D, H, layers=2).eval()
    tm.th = None  # same unset-attribute defect as SimpleBiLSTM
    params, cfg, arch = transplant(tm)
    assert arch == "MLP" and cfg.num_layers == 2
    model = build(arch, cfg)

    x, lengths, tags = batch(rng, D=D, lengths=(40, 40, 40, 40))
    lt = torch.from_numpy(lengths)

    with torch.no_grad():
        want = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags)).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)

    with torch.no_grad():
        _, ref_tags = tm(torch.from_numpy(x), lt, 0.4)
    _, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    assert_boundaries_identical(tags_j, ref_tags, lengths)


# ---------------------------------------------------------------------------
# SheikhBiLSTM (models/CRF.py:980-1041)
# ---------------------------------------------------------------------------

def test_sheikh_bilstm(ref, rng):
    torch.manual_seed(8)
    D, H = 12, 8
    tm = ref.CRF.SheikhBiLSTM(2, D, H, num_layers=1, dropout_in=0.0).eval()
    tm.th = None  # unset-attribute defect again (models/CRF.py:1036)
    params, cfg, arch = transplant(tm)
    assert arch == "SheikhBiLSTM"
    model = build(arch, cfg)

    x, lengths, tags = batch(rng, D=D)
    lt = torch.from_numpy(lengths)

    with torch.no_grad():
        want = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags)).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)

    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), lt, 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    assert_boundaries_identical(tags_j, ref_tags, lengths)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb, 0], scores_t.numpy()[b, :Lb, 0], atol=1e-5
        )


# ---------------------------------------------------------------------------
# SwitchBiLSTM (models/CRF.py:1046-1270) — pure-domain batches only (the
# reference's mixed-batch paths are defective, see module docstring)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["dense", "lstm"])
@pytest.mark.parametrize("domain", [0, 1])
def test_switch_bilstm(ref, rng, mode, domain):
    torch.manual_seed(9)
    D, H = 12, 8
    tm = ref.CRF.SwitchBiLSTM(
        2, D, H, num_layers=1, loss_fn="FocalLoss", device="cpu",
        switch_lstm_adapt=mode == "lstm", switch_dense_adapt=mode == "dense",
    ).eval()
    params, cfg, arch = transplant(tm)
    assert arch == "SwitchBiLSTM" and cfg.switch == mode
    cfg = dataclasses.replace(cfg, loss_fn="FocalLoss")
    model = build(arch, cfg)

    x, lengths, tags = batch(rng, D=D)
    lt = torch.from_numpy(lengths)
    domains = [domain] * 4

    with torch.no_grad():
        want = tm.loss(
            torch.from_numpy(x), lt, torch.from_numpy(tags), domains
        ).item()
    got = model.loss(
        params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags),
        jnp.asarray(domains),
    )
    np.testing.assert_allclose(float(got), want, rtol=2e-5, atol=1e-6)

    with torch.no_grad():
        _, ref_tags = tm(torch.from_numpy(x), lt, domains, 0.4)
    _, tags_j = model.decode(
        params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(domains), 0.4
    )
    assert_boundaries_identical(tags_j, ref_tags, lengths)


# ---------------------------------------------------------------------------
# training trajectory: same weights + same optimizer settings -> same losses
# (reference optimizer: Adam(lr, eps=1e-7), lightning_model.py:759-781)
# ---------------------------------------------------------------------------

def test_training_trajectory_matches_reference(ref, rng):
    torch.manual_seed(10)
    D, H, steps, lr = 12, 8, 6, 1e-3
    tm = ref.CRF.BiLSTM(2, D, H, num_layers=1, loss_fn="FocalLoss", device="cpu")
    params, cfg, arch = transplant(tm)
    cfg = dataclasses.replace(cfg, loss_fn="FocalLoss")
    model = build(arch, cfg)

    x, lengths, tags = batch(rng, D=D)
    lt = torch.from_numpy(lengths)

    opt_t = torch.optim.Adam(tm.parameters(), lr=lr, eps=1e-7)
    ref_losses = []
    for _ in range(steps):
        opt_t.zero_grad()
        loss = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags))
        loss.backward()
        ref_losses.append(loss.item())
        opt_t.step()

    opt = optax.adam(lr, eps=1e-7)
    opt_state = opt.init(params)
    loss_fn = jax.jit(
        lambda p: model.loss(p, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    )
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: model.loss(p, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    ))
    fw_losses = []
    for _ in range(steps):
        loss, grads = grad_fn(params)
        fw_losses.append(float(loss))
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(fw_losses, ref_losses, rtol=5e-4, atol=1e-6)
    # and the post-training decodes still agree
    with torch.no_grad():
        _, ref_tags = tm.eval()(torch.from_numpy(x), lt, 0.5)
    _, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.5)
    assert_boundaries_identical(tags_j, ref_tags, lengths)


# ---------------------------------------------------------------------------
# Transformer_segmenter (models/CRF.py:508-610) — the restricted path runs
# a REAL HF LongformerModel with pyramidal windows; transplanting its
# weights proves the blocked local attention against HF's sliding-chunks
# implementation, not a replica
# ---------------------------------------------------------------------------

def _transplant_longformer(ref_seg, cfg):
    """HF LongformerModel (inside Longformer_Local_Attention) + classifier
    -> TransformerSegmenter params. With inputs_embeds, HF adds
    position_embeddings (ids offset by padding_idx+1 = 2) and the constant
    token_type_embeddings[0] before the embedding LayerNorm; both fold into
    the framework's single positional table."""
    sd = {k: v.detach().numpy() for k, v in ref_seg.model.model.state_dict().items()}
    tok0 = sd["embeddings.token_type_embeddings.weight"][0]
    pos_hf = sd["embeddings.position_embeddings.weight"]
    enc = {
        "pos": jnp.asarray(pos_hf[2:] + tok0),
        "ln_emb": {
            "scale": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
            "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"]),
        },
        "layers": [],
    }

    def lin(prefix):
        return {
            "w": jnp.asarray(sd[prefix + ".weight"].T),
            "b": jnp.asarray(sd[prefix + ".bias"]),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
        }

    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"encoder.layer.{i}"
        enc["layers"].append({
            "attn": {
                "q": lin(f"{p}.attention.self.query"),
                "k": lin(f"{p}.attention.self.key"),
                "v": lin(f"{p}.attention.self.value"),
                "o": lin(f"{p}.attention.output.dense"),
            },
            "ln1": ln(f"{p}.attention.output.LayerNorm"),
            "ff1": lin(f"{p}.intermediate.dense"),
            "ff2": lin(f"{p}.output.dense"),
            "ln2": ln(f"{p}.output.LayerNorm"),
        })
        i += 1
    cls = {
        "w": jnp.asarray(ref_seg.classification.weight.detach().numpy().T),
        "b": jnp.asarray(ref_seg.classification.bias.detach().numpy()),
    }
    return {"encoder": enc, "cls": cls}


@pytest.mark.parametrize("loss_fn", ["FocalLoss", "CrossEntropy"])
def test_transformer_segmenter_longformer_oracle(ref, rng, loss_fn):
    torch.manual_seed(11)
    D, FF, layers, heads, win = 16, 48, 2, 2, 4
    tm = ref.CRF.Transformer_segmenter(
        2, D, FF, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn=loss_fn, restricted=True, window_size=win,
    ).eval()
    tm.device = "cpu"
    # the reference builds pyramidal windows [win*k for k in layers..1]
    assert tm.model.configuration.attention_window == [8, 4]

    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=FF, num_layers=layers, nheads=heads,
        attention_window=win, loss_fn=loss_fn, dropout_in=0.0,
    )
    from multimodaltopicsegmentation_tpu.models.transformers import (
        TransformerSegmenter,
        pyramidal_windows,
    )

    model = TransformerSegmenter(cfg)
    assert model.encoder.windows == pyramidal_windows(win, layers) == [8, 4]
    params = _transplant_longformer(tm, cfg)

    x, lengths, tags = batch(rng, D=D, ce=loss_fn == "CrossEntropy")
    lt = torch.from_numpy(lengths)

    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), lt, 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)

    with torch.no_grad():
        want = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags)).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-6)


def test_classic_transformer_oracle(ref, rng):
    """restricted=False runs a REAL HF BertModel (dense attention; position
    ids start at 0, no offset)."""
    torch.manual_seed(12)
    D, FF, layers, heads = 16, 48, 2, 2
    tm = ref.CRF.Transformer_segmenter(
        2, D, FF, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn="FocalLoss", restricted=False,
    ).eval()
    tm.device = "cpu"

    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=FF, num_layers=layers, nheads=heads,
        loss_fn="FocalLoss", dropout_in=0.0,
    )
    from multimodaltopicsegmentation_tpu.models.transformers import TransformerSegmenter

    model = TransformerSegmenter(cfg, restricted=False)
    params = _transplant_longformer(tm, cfg)
    # BertModel position ids start at 0 (no Longformer +2 offset)
    sd = {k: v.detach().numpy() for k, v in tm.model.model.state_dict().items()}
    params["encoder"]["pos"] = jnp.asarray(
        sd["embeddings.position_embeddings.weight"]
        + sd["embeddings.token_type_embeddings.weight"][0]
    )

    x, lengths, tags = batch(rng, D=D)
    lt = torch.from_numpy(lengths)
    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), lt, 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)


# ---------------------------------------------------------------------------
# RecurrentLongT5 (models/CRF.py:613-762) — each block runs a REAL HF
# LongT5EncoderModel (local attention + relative buckets, T5 no-scaling);
# transplanting its weights proves the LongT5 path against HF, not a replica
# ---------------------------------------------------------------------------

def _transplant_longt5_encoder(hf_model):
    """HF LongT5EncoderModel -> LongT5Encoder params (T5 linears carry no
    biases; all layers share block-0's relative_attention_bias, exactly as
    T5 reuses the first layer's position_bias)."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    def nob(name):
        w = sd[name + ".weight"]
        return {"w": jnp.asarray(w.T), "b": jnp.zeros((w.shape[0],), np.float32)}

    layers = []
    i = 0
    while f"encoder.block.{i}.layer.0.LocalSelfAttention.q.weight" in sd:
        p = f"encoder.block.{i}"
        layers.append({
            "attn": {
                "q": nob(f"{p}.layer.0.LocalSelfAttention.q"),
                "k": nob(f"{p}.layer.0.LocalSelfAttention.k"),
                "v": nob(f"{p}.layer.0.LocalSelfAttention.v"),
                "o": nob(f"{p}.layer.0.LocalSelfAttention.o"),
            },
            "ln1": {"scale": jnp.asarray(sd[f"{p}.layer.0.layer_norm.weight"])},
            "wi": nob(f"{p}.layer.1.DenseReluDense.wi"),
            "wo": nob(f"{p}.layer.1.DenseReluDense.wo"),
            "ln2": {"scale": jnp.asarray(sd[f"{p}.layer.1.layer_norm.weight"])},
        })
        i += 1
    return {
        "layers": layers,
        "rel_bias": jnp.asarray(
            sd["encoder.block.0.layer.0.LocalSelfAttention.relative_attention_bias.weight"]
        ),
        "ln_final": {"scale": jnp.asarray(sd["encoder.final_layer_norm.weight"])},
    }


def test_recurrent_longt5_oracle(ref, rng):
    torch.manual_seed(13)
    D, H, layers, heads, radius = 16, 8, 2, 2, 3
    tm = ref.CRF.RecurrentLongT5(
        2, D, H, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn="FocalLoss", window_size=radius,
    ).eval()
    hf_cfg = tm.model[0].transformer.configuration
    assert hf_cfg.local_radius == radius
    assert hf_cfg.relative_attention_num_buckets == max(4, radius)

    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=H, num_layers=layers, nheads=heads,
        attention_window=radius, loss_fn="FocalLoss", dropout_in=0.0,
    )
    model = build("RecurrentLongT5", cfg)
    from multimodaltopicsegmentation_tpu.tools.convert_reference_checkpoint import (
        _convert_rnn_stack,
    )

    blocks = []
    for i in range(layers):
        lstm_sd = {f"rnn.{k}": v for k, v in tm.model[i].lstm.rnn.state_dict().items()}
        stack = _convert_rnn_stack(lstm_sd, "rnn", 1, True, True)
        blocks.append({
            "lstm": jax.tree_util.tree_map(jnp.asarray, stack[0]),
            "t5": _transplant_longt5_encoder(tm.model[i].transformer.model),
        })
    params = {
        "blocks": blocks,
        "cls": {
            "w": jnp.asarray(tm.classification.weight.detach().numpy().T),
            "b": jnp.asarray(tm.classification.bias.detach().numpy()),
        },
    }

    x, lengths, tags = batch(rng, D=D)
    lt = torch.from_numpy(lengths)

    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), lt, 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)

    with torch.no_grad():
        want = tm.loss(torch.from_numpy(x), lt, torch.from_numpy(tags)).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# the sliding-window attention CORE vs HF's LongformerSelfAttention — the
# reference's missing longformer_noffn module is a vendored copy of this
# exact class (SURVEY.md §2.0 row 10), so this is the closest executable
# oracle for the RecurrentLongformer MHA blocks
# ---------------------------------------------------------------------------

def test_longformer_self_attention_core_oracle(rng):
    import torch as t
    from transformers import LongformerConfig
    from transformers.models.longformer.modeling_longformer import (
        LongformerSelfAttention,
    )

    from multimodaltopicsegmentation_tpu.ops.attention import (
        local_attention,
        merge_heads,
        split_heads,
    )

    t.manual_seed(14)
    D, heads, window = 16, 2, 4
    c = LongformerConfig()
    c.hidden_size, c.num_attention_heads = D, heads
    c.attention_window, c.num_hidden_layers = [window], 1
    hf = LongformerSelfAttention(c, layer_id=0).eval()

    B, L = 2, 16
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([16, 12])
    am = np.zeros((B, L), np.float32)
    am[1, 12:] = -10000.0  # HF convention: negative = padding-masked key

    with torch.no_grad():
        want = hf(
            torch.from_numpy(x),
            attention_mask=torch.from_numpy(am),
            layer_head_mask=None,
            is_index_masked=torch.from_numpy(am) < 0,
            is_index_global_attn=torch.from_numpy(am) > 0,
            is_global_attn=False,
        )[0].numpy()

    sd = hf.state_dict()
    xj = jnp.asarray(x)
    q = split_heads(xj @ jnp.asarray(sd["query.weight"].numpy().T)
                    + jnp.asarray(sd["query.bias"].numpy()), heads)
    k = split_heads(xj @ jnp.asarray(sd["key.weight"].numpy().T)
                    + jnp.asarray(sd["key.bias"].numpy()), heads)
    v = split_heads(xj @ jnp.asarray(sd["value.weight"].numpy().T)
                    + jnp.asarray(sd["value.bias"].numpy()), heads)
    mask = jnp.asarray((np.arange(L)[None] < lengths[:, None]).astype(np.float32))
    got = np.asarray(merge_heads(local_attention(q, k, v, window, mask)))

    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(got[b, :Lb], want[b, :Lb], atol=2e-5)


# ---------------------------------------------------------------------------
# transformer-family checkpoint conversion through the PRODUCTION converter
# (round-4: the oracle transplants above prove the HF weight layouts; these
# prove tools/convert_reference_checkpoint.py maps the same state_dicts)
# ---------------------------------------------------------------------------


def test_converter_transformer_segmenter_checkpoint(ref, rng, capsys):
    torch.manual_seed(21)
    D, FF, layers, heads, win = 16, 48, 2, 2, 4
    tm = ref.CRF.Transformer_segmenter(
        2, D, FF, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn="FocalLoss", restricted=True, window_size=win,
    ).eval()
    tm.device = "cpu"

    params, cfg, arch = transplant(tm)
    assert arch == "Transformer"
    assert (cfg.embedding_dim, cfg.hidden_dim, cfg.num_layers) == (D, FF, layers)
    assert cfg.loss_fn == "BinaryCrossEntropy"  # sigmoid head, decode-equal
    # heads/window are not recorded in a TextSegmenter checkpoint (the
    # reference re-supplies them at load time); override the assumed defaults
    cfg = dataclasses.replace(cfg, nheads=heads, attention_window=win)
    model = build("Transformer", cfg)
    # the HF global-attention projections are unconsumed and must be reported
    assert "query_global" in capsys.readouterr().err

    x, lengths, tags = batch(rng, D=D)
    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), torch.from_numpy(lengths), 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)


def test_converter_transformer_dense_checkpoint(ref, rng):
    """restricted=False (BertModel) converts with attention_window=0, which
    the registry builds as the dense TransformerSegmenter."""
    torch.manual_seed(22)
    D, FF, layers, heads = 16, 48, 2, 2
    tm = ref.CRF.Transformer_segmenter(
        2, D, FF, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn="FocalLoss", restricted=False,
    ).eval()
    tm.device = "cpu"

    params, cfg, arch = transplant(tm)
    assert arch == "Transformer" and cfg.attention_window == 0
    cfg = dataclasses.replace(cfg, nheads=heads)
    model = build("Transformer", cfg)
    assert model.encoder.windows is None  # dense

    x, lengths, _tags = batch(rng, D=D)
    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), torch.from_numpy(lengths), 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)


def test_converter_recurrent_longt5_checkpoint(ref, rng):
    """nheads and the local radius ARE inferable here, from the shared
    relative_attention_bias table ([num_buckets, nheads], num_buckets =
    max(4, radius))."""
    torch.manual_seed(23)
    D, H, layers, heads, radius = 16, 8, 2, 2, 5
    tm = ref.CRF.RecurrentLongT5(
        2, D, H, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn="FocalLoss", window_size=radius,
    ).eval()

    params, cfg, arch = transplant(tm)
    assert arch == "RecurrentLongT5"
    assert (cfg.embedding_dim, cfg.hidden_dim, cfg.num_layers) == (D, H, layers)
    assert cfg.nheads == heads and cfg.attention_window == radius
    model = build("RecurrentLongT5", cfg)

    x, lengths, _tags = batch(rng, D=D)
    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), torch.from_numpy(lengths), 0.4)
    scores_j, tags_j = model.decode(params, jnp.asarray(x), jnp.asarray(lengths), 0.4)
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)


def test_converter_rejects_impossible_architectures():
    with pytest.raises(ValueError, match="cannot produce checkpoints"):
        convert_state_dict({}, "Transformer-CRF")
    with pytest.raises(ValueError, match="block prefix"):
        convert_state_dict({}, "BiLSTMRestrictedMHA")


@pytest.mark.slow
def test_recurrent_longformer_oracle(ref, rng):
    """The reference's RecurrentLongformer (models/CRF.py:764-858) run END TO
    END through the reference's own CRF.py: its pyc-only longformer_noffn
    dependency is satisfied by the functional stub above, whose every
    behavior is a bytecode receipt in tests/test_reference_pyc_glue.py (the
    layer is attention-only with NO o-proj/residual/LayerNorm, and
    external_input feeds only the key projection). Weights cross through the
    production converter; decode must be boundary-identical, scores and loss
    must match. L is pinned to 3600 by the reference's own asserts
    (models/CRF.py:670,675,681)."""
    torch.manual_seed(31)
    D, H, layers, heads, window = 16, 8, 2, 2, 4
    L = 3600  # hard-coded in the reference's block asserts
    tm = ref.CRF.RecurrentLongformer(
        2, D, H, num_layers=layers, nheads=heads, dropout_in=0.0,
        dropout_out=0.0, loss_fn="FocalLoss", window_size=window,
    ).eval()
    # the stub produced the vendored state_dict layout (attention.self.*)
    assert any(
        ".transformer.model.attention.self.query.weight" in k
        for k in tm.state_dict()
    )

    params, cfg, arch = transplant(tm)
    assert arch == "BiLSTMRestrictedMHA"
    assert (cfg.embedding_dim, cfg.hidden_dim, cfg.num_layers) == (D, H, layers)
    # nheads/window (and Focal-vs-BCE, indistinguishable from the width-1
    # head) are not recoverable from shapes — the reference re-supplies them
    # at load time (predict.py:228-241); override like predict does
    cfg = dataclasses.replace(
        cfg, nheads=heads, attention_window=window, loss_fn="FocalLoss"
    )
    model = build(arch, cfg)

    x = rng.standard_normal((2, L, D)).astype(np.float32)
    lengths = np.asarray([L, L - 70], np.int64)
    tags = (rng.random((2, L)) < 0.2).astype(np.float32)
    tags = np.where(np.arange(L)[None, :] >= lengths[:, None], 0.0, tags)

    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), torch.from_numpy(lengths), 0.4)
    decode = jax.jit(lambda p, a, l: model.decode(p, a, l, 0.4))
    scores_j, tags_j = decode(params, jnp.asarray(x), jnp.asarray(lengths))
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)

    with torch.no_grad():
        want = tm.loss(
            torch.from_numpy(x), torch.from_numpy(lengths), torch.from_numpy(tags)
        ).item()
    got = model.loss(params, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(tags))
    np.testing.assert_allclose(float(got), want, rtol=1e-4, atol=1e-6)


def test_predict_cli_loads_converted_transformer_checkpoint(ref, rng, tmp_path):
    """End to end: reference Transformer_segmenter torch checkpoint ->
    tools/convert_reference_checkpoint.py (with the explicit --nheads /
    --attention_window the reference itself re-supplies at load time) ->
    cli/predict.py produces the torch model's exact boundaries."""
    import os
    import pickle

    torch.manual_seed(24)
    D, FF, layers, heads, win = 16, 48, 1, 2, 4
    tm = ref.CRF.Transformer_segmenter(
        2, D, FF, num_layers=layers, nheads=heads, dropout_in=0.0,
        loss_fn="FocalLoss", restricted=True, window_size=win,
    ).eval()
    tm.device = "cpu"

    raw = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()}}, raw)

    from multimodaltopicsegmentation_tpu.tools.convert_reference_checkpoint import (
        convert_checkpoint,
    )

    conv = str(tmp_path / "best_model")
    _, cfg, arch = convert_checkpoint(raw, conv, nheads=heads, attention_window=win)
    assert arch == "Transformer" and cfg.nheads == heads and cfg.attention_window == win

    from tests.synth import make_synthetic_corpus

    emb_dir, _lab, _split = make_synthetic_corpus(str(tmp_path / "c"), n_docs=4, dim=D)

    results_txt = tmp_path / "results.txt"
    results_txt.write_text(
        "Sentence encoder: CNN\nNeural architecture: Transformer\n"
        f"Hidden units: {FF}\nNumber of layers: {layers}\n"
    )
    import multimodaltopicsegmentation_tpu.cli.predict as P

    if ("CNN", D) not in P.ENCODER_DIMS:
        P.ENCODER_DIMS.append(("CNN", D))

    pred = P.Predictor(str(results_txt), conv, threshold=0.4)
    exp = str(tmp_path / "pexp")
    results = pred.predict(emb_dir, exp, write_audio_segments=False, batch_size=2)
    assert len(results) == 4

    with open(os.path.join(exp, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    for name, tags in res.items():
        emb = np.load(os.path.join(emb_dir, name)).astype(np.float32)
        with torch.no_grad():
            _s, want = tm(torch.from_numpy(emb[None]), torch.tensor([len(emb)]), 0.4)
        assert [int(t) for t in np.asarray(tags, bool)] == [int(v) for v in want[0]]


@pytest.mark.slow
def test_recurrent_longformer_fused_mode_oracle(ref, rng):
    """The separate_forward_backward=False branch: the WHOLE 2H BiLSTM
    output queries/keys/values itself through the same attention-only layer
    (models/CRF.py:778-784 passes the flag through; the vendored layer then
    sees no external_input). The reference can only EXECUTE this mode with
    num_layers=1 and last_bilstm=False: its stacked blocks and trailing RNN
    are constructed with input width `hidden_dim` (models/CRF.py:780,787)
    while a fused block emits 2*hidden_dim — a latent shape crash
    (reproduced: torch 'mat1 and mat2 shapes cannot be multiplied'). The
    framework's else-branch chains any depth (in_dim follows attn_dim);
    parity is proven on the one configuration the reference runs.
    TextSegmenter never builds this mode, so the production converter
    rejects such checkpoints (width == 2*hidden) — the transplant here is
    manual."""
    torch.manual_seed(33)
    D, H, heads, window = 16, 8, 2, 4
    L = 3600
    tm = ref.CRF.RecurrentLongformer(
        2, D, H, num_layers=1, nheads=heads, dropout_in=0.0,
        dropout_out=0.0, loss_fn="FocalLoss", window_size=window,
        separate_forward_backward=False, last_bilstm=False,
    ).eval()
    sd = {f"model.{k}": v for k, v in tm.state_dict().items()}
    with pytest.raises(ValueError, match="separate_forward_backward=False"):
        convert_state_dict(sd, "BiLSTMRestrictedMHA")

    from multimodaltopicsegmentation_tpu.models.transformers import (
        RecurrentLongformer,
    )
    from multimodaltopicsegmentation_tpu.tools.convert_reference_checkpoint import (
        _convert_rnn_stack,
        _linear,
    )

    cfg = TaggerConfig(
        embedding_dim=D, hidden_dim=H, num_layers=1, nheads=heads,
        attention_window=window, loss_fn="FocalLoss",
    )
    model = RecurrentLongformer(
        cfg, separate_forward_backward=False, last_bilstm=False
    )
    sd = {k: v for k, v in tm.state_dict().items()}
    a = "model.0.transformer.model.attention.self"
    params = jax.tree_util.tree_map(jnp.asarray, {
        "blocks": [{
            "lstm": _convert_rnn_stack(sd, "model.0.lstm.rnn", 1, True, True)[0],
            "attn": {
                "q": _linear(sd, f"{a}.query"),
                "k": _linear(sd, f"{a}.key"),
                "v": _linear(sd, f"{a}.value"),
            },
        }],
        "cls": _linear(sd, "classification"),
    })

    x = rng.standard_normal((2, L, D)).astype(np.float32)
    lengths = np.asarray([L, L - 41], np.int64)
    with torch.no_grad():
        scores_t, ref_tags = tm(torch.from_numpy(x), torch.from_numpy(lengths), 0.4)
    decode = jax.jit(lambda p, a, l: model.decode(p, a, l, 0.4))
    scores_j, tags_j = decode(params, jnp.asarray(x), jnp.asarray(lengths))
    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(scores_j)[b, :Lb], scores_t.numpy()[b, :Lb], atol=2e-4
        )
    assert_boundaries_identical(tags_j, ref_tags, lengths)


@pytest.mark.slow
def test_predict_cli_loads_converted_recurrent_longformer_checkpoint(
    ref, rng, tmp_path
):
    """End to end: reference RecurrentLongformer torch checkpoint (saved
    through the bytecode-receipted stub, so the state_dict has the vendored
    layout) -> tools/convert_reference_checkpoint.py -> cli/predict.py
    produces the torch model's exact boundaries. Docs are 3600 units — the
    length the reference's own asserts pin."""
    import os
    import pickle

    torch.manual_seed(34)
    D, H, layers, heads, window = 16, 8, 1, 2, 4
    L = 3600
    tm = ref.CRF.RecurrentLongformer(
        2, D, H, num_layers=layers, nheads=heads, dropout_in=0.0,
        dropout_out=0.0, loss_fn="FocalLoss", window_size=window,
    ).eval()

    raw = str(tmp_path / "ref.ckpt")
    torch.save(
        {"state_dict": {f"model.{k}": v for k, v in tm.state_dict().items()}}, raw
    )

    from multimodaltopicsegmentation_tpu.tools.convert_reference_checkpoint import (
        convert_checkpoint,
    )

    conv = str(tmp_path / "best_model")
    _, cfg, arch = convert_checkpoint(raw, conv, nheads=heads, attention_window=window)
    assert arch == "BiLSTMRestrictedMHA"
    assert cfg.nheads == heads and cfg.attention_window == window

    from tests.synth import make_synthetic_corpus

    emb_dir, _lab, _split = make_synthetic_corpus(
        str(tmp_path / "c"), n_docs=2, dim=D, min_units=L, max_units=L + 1
    )

    results_txt = tmp_path / "results.txt"
    results_txt.write_text(
        "Sentence encoder: CNN\nNeural architecture: BiLSTMRestrictedMHA\n"
        f"Hidden units: {H}\nNumber of layers: {layers}\n"
    )
    import multimodaltopicsegmentation_tpu.cli.predict as P

    if ("CNN", D) not in P.ENCODER_DIMS:
        P.ENCODER_DIMS.append(("CNN", D))

    pred = P.Predictor(str(results_txt), conv, threshold=0.4)
    exp = str(tmp_path / "pexp")
    results = pred.predict(emb_dir, exp, write_audio_segments=False, batch_size=2)
    assert len(results) == 2

    with open(os.path.join(exp, "results.pkl"), "rb") as f:
        res = pickle.load(f)
    for name, tags in res.items():
        emb = np.load(os.path.join(emb_dir, name)).astype(np.float32)
        with torch.no_grad():
            _s, want = tm(
                torch.from_numpy(emb[None]), torch.tensor([len(emb)]), 0.4
            )
        assert [int(t) for t in np.asarray(tags, bool)] == [int(v) for v in want[0]]


def test_longformer_external_kv_block_oracle(rng):
    """RecurrentLongformer's external_input trick (models/CRF.py:673-679):
    the fwd-LSTM half queries the bwd-LSTM half's KEYS inside a Longformer
    sliding-chunks attention — values stay on the forward half (the vendored
    pyc's `value_vectors = self.value(hidden_states)` is unconditional;
    bytecode receipt in tests/test_reference_pyc_glue.py). The vendored
    longformer_noffn module ships only as 3.8/3.10 bytecode (unloadable on
    this image's 3.12), but HF's own LongformerSelfAttention IS importable —
    here its key projection is redirected to the external stream so HF's
    full forward (sliding-chunks matmuls, diagonal masking, padding
    plumbing) runs the external-key semantics, and the framework's
    local_attention must match. The surrounding glue (attention-only layer,
    no residual/LayerNorm) is recovered from the bytecode and oracled
    end-to-end in test_recurrent_longformer_oracle."""
    import torch as t
    from transformers import LongformerConfig
    from transformers.models.longformer.modeling_longformer import (
        LongformerSelfAttention,
    )

    from multimodaltopicsegmentation_tpu.ops.attention import (
        local_attention,
        merge_heads,
        split_heads,
    )

    t.manual_seed(15)
    D, heads, window = 16, 2, 4
    c = LongformerConfig()
    c.hidden_size, c.num_attention_heads = D, heads
    c.attention_window, c.num_hidden_layers = [window], 1
    hf = LongformerSelfAttention(c, layer_id=0).eval()

    B, L = 2, 16
    h_for = rng.standard_normal((B, L, D)).astype(np.float32)
    h_bac = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([16, 12])
    am = np.zeros((B, L), np.float32)
    am[1, 12:] = -10000.0

    class _FromExternal(torch.nn.Module):
        """Projection that ignores its input and projects the external
        stream — exactly `key/value(external_input)` with HF's own weights.
        HF transposes hidden_states to [seq, batch, dim] before projecting
        (modeling_longformer LongformerSelfAttention.forward line 1), so the
        external stream gets the same layout."""

        def __init__(self, lin, src):
            super().__init__()
            self.lin = lin
            self.src = src.transpose(0, 1)

        def forward(self, _x):
            return self.lin(self.src)

    ext = torch.from_numpy(h_bac)
    hf.key = _FromExternal(hf.key, ext)

    with torch.no_grad():
        want = hf(
            torch.from_numpy(h_for),
            attention_mask=torch.from_numpy(am),
            layer_head_mask=None,
            is_index_masked=torch.from_numpy(am) < 0,
            is_index_global_attn=torch.from_numpy(am) > 0,
            is_global_attn=False,
        )[0].numpy()

    sd = {k: v for k, v in hf.state_dict().items()}
    proj = lambda x, p: x @ jnp.asarray(sd[f"{p}.weight"].numpy().T) + jnp.asarray(
        sd[f"{p}.bias"].numpy()
    )
    q = split_heads(proj(jnp.asarray(h_for), "query"), heads)
    k = split_heads(proj(jnp.asarray(h_bac), "key.lin"), heads)
    v = split_heads(proj(jnp.asarray(h_for), "value"), heads)
    mask = jnp.asarray((np.arange(L)[None] < lengths[:, None]).astype(np.float32))
    got = np.asarray(merge_heads(local_attention(q, k, v, window, mask)))

    for b, Lb in enumerate(lengths):
        np.testing.assert_allclose(got[b, :Lb], want[b, :Lb], atol=2e-5)
