#!/usr/bin/env python
"""Convert a reference-trained TextSegmenter checkpoint into a framework one.

The reference trains `TextSegmenter` (a pytorch-lightning module wrapping the
tagger zoo, /root/reference/models/lightning_model.py:178-250) and saves
torch checkpoints whose `state_dict` carries keys like

    model.model.rnn.weight_ih_l0[_reverse]   (BiLSTM / BiRnnCrf towers)
    model.model1.rnn.* / model.model2.rnn.*  (BiLSTMLateFusion towers)
    model.classification.{weight,bias}       (sigmoid / softmax heads)
    model.crf.fc.{weight,bias}, model.crf.transitions

This tool maps them onto the framework's pytrees (models/taggers.py) so a
user holding reference-trained weights can decode with cli/predict.py and
get identical boundaries.

The reference's own loader guesses the loss head by trying BinaryCrossEntropy
and falling back to CrossEntropy on KeyError (/root/reference/predict.py:227-256,
the two heads differ only in the classifier's output width). Here the same
decision is made deterministically from the classifier shape: out_features 1
-> sigmoid head (BinaryCrossEntropy decode), otherwise CrossEntropy.

Usage:
    python tools/convert_reference_checkpoint.py REF.ckpt OUT.ckpt \
        [--architecture BiLSTM]

Everything else (hidden size, layers, bidirectionality, LSTM vs GRU,
embedding dims, tagset size) is inferred from the state_dict shapes.
"""
from __future__ import annotations

import argparse
import re


def _to_np(t):
    import numpy as np

    # copy=True: torch's .numpy() shares storage with the live parameter, and
    # downstream jnp.asarray on CPU is zero-copy too — without the copy the
    # converted params would silently track later in-place optimizer updates
    # of the source module
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t, copy=True)


def _strip_prefix(state_dict: dict) -> dict:
    """Accept both a Lightning `TextSegmenter` state_dict (keys under
    'model.') and a bare tagger state_dict."""
    if any(k.startswith("model.") for k in state_dict):
        return {k[len("model."):]: v for k, v in state_dict.items() if k.startswith("model.")}
    return dict(state_dict)


def infer_architecture(sd: dict) -> str:
    if any(k.startswith("crf.") for k in sd):
        return "biLSTMCRF"
    if any(k.startswith("model1.") for k in sd):
        return "BiLSTMLateFusion"
    if any(k.startswith("forward_dense.") for k in sd):
        return "SheikhBiLSTM"  # coherence scorer (models/CRF.py:980-1041)
    if any(k.startswith(("model_1.", "classification_1.")) for k in sd):
        return "SwitchBiLSTM"  # domain adaptation (models/CRF.py:1046-1270)
    if any(k.startswith("lstm.rnn.") for k in sd):
        return "SheikhBiLSTM"
    if any(k.startswith("lstm.") for k in sd):
        return "SimpleBiLSTM"  # bare nn.LSTM + `.classifier` head
    if any(k.startswith("layers.") for k in sd):
        return "MLP"
    return "BiLSTM"


def _rnn_geometry(sd: dict, prefix: str):
    """(num_layers, hidden, in_dim, bidirectional, is_lstm) from shapes."""
    w_ih0 = _to_np(sd[f"{prefix}.weight_ih_l0"])
    w_hh0 = _to_np(sd[f"{prefix}.weight_hh_l0"])
    hidden = w_hh0.shape[1]
    gates = w_hh0.shape[0] // hidden  # 4 = LSTM, 3 = GRU
    layers = 0
    while f"{prefix}.weight_ih_l{layers}" in sd:
        layers += 1
    return (
        layers,
        hidden,
        w_ih0.shape[1],
        f"{prefix}.weight_ih_l0_reverse" in sd,
        gates == 4,
    )


def _convert_rnn_stack(sd: dict, prefix: str, layers: int, bidirectional: bool,
                       is_lstm: bool) -> list:
    """torch nn.LSTM/GRU tensors -> the framework's per-layer dicts
    (ops/rnn.py lstm_params/gru_params layouts; torch gate order kept)."""
    stack = []
    for k in range(layers):
        entry = {}
        dirs = [("", "fwd")] + ([("_reverse", "bwd")] if bidirectional else [])
        for suffix, key in dirs:
            w_ih = _to_np(sd[f"{prefix}.weight_ih_l{k}{suffix}"]).T
            w_hh = _to_np(sd[f"{prefix}.weight_hh_l{k}{suffix}"]).T
            b_ih = _to_np(sd[f"{prefix}.bias_ih_l{k}{suffix}"])
            b_hh = _to_np(sd[f"{prefix}.bias_hh_l{k}{suffix}"])
            # both cells keep b_ih/b_hh separate: the GRU needs b_hh inside
            # the reset product, and the LSTM needs the torch two-tensor
            # parametrization for optimizer-trajectory parity (each bias
            # receives the full gradient under Adam; see ops/rnn.py)
            entry[key] = {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh}
        stack.append(entry)
    return stack


def _linear(sd: dict, prefix: str) -> dict:
    return {"w": _to_np(sd[f"{prefix}.weight"]).T, "b": _to_np(sd[f"{prefix}.bias"])}


def convert_state_dict(state_dict: dict, architecture: str = None):
    """-> (params, TaggerConfig, architecture_name)."""
    from multimodaltopicsegmentation_tpu.models.base import TaggerConfig

    sd = _strip_prefix(state_dict)
    architecture = architecture or infer_architecture(sd)

    if architecture == "SimpleBiLSTM":
        # reference SimpleBiLSTM holds the nn.LSTM directly as `.lstm` and
        # the head as `.classifier` (models/CRF.py:895-915)
        layers, hidden, in_dim, bidir, is_lstm = _rnn_geometry(sd, "lstm")
        cls = _linear(sd, "classifier")
        cfg = TaggerConfig(
            embedding_dim=in_dim, hidden_dim=hidden, num_layers=layers,
            bidirectional=bidir, lstm=is_lstm, loss_fn="BinaryCrossEntropy",
        )
        params = {
            "rnn": _convert_rnn_stack(sd, "lstm", layers, bidir, is_lstm),
            "cls": cls,
        }
        return params, cfg, "SimpleBiLSTM"

    if architecture in ("BiLSTM", "LSTM"):
        layers, hidden, in_dim, bidir, is_lstm = _rnn_geometry(sd, "model.rnn")
        cls = _linear(sd, "classification")
        out = cls["w"].shape[1]
        cfg = TaggerConfig(
            embedding_dim=in_dim, hidden_dim=hidden, num_layers=layers,
            tagset_size=max(out, 2), bidirectional=bidir, lstm=is_lstm,
            loss_fn="CrossEntropy" if out > 1 else "BinaryCrossEntropy",
        )
        params = {
            "rnn": _convert_rnn_stack(sd, "model.rnn", layers, bidir, is_lstm),
            "cls": cls,
        }
        return params, cfg, "BiLSTM"

    if architecture == "BiLSTMLateFusion":
        layers, hidden, in1, bidir, is_lstm = _rnn_geometry(sd, "model1.rnn")
        _, _, in2, _, _ = _rnn_geometry(sd, "model2.rnn")
        cls = _linear(sd, "classification")
        out = cls["w"].shape[1]
        cfg = TaggerConfig(
            embedding_dim=in1, embedding_dim2=in2, hidden_dim=hidden,
            num_layers=layers, tagset_size=max(out, 2), bidirectional=bidir,
            lstm=is_lstm,
            loss_fn="CrossEntropy" if out > 1 else "BinaryCrossEntropy",
        )
        params = {
            "rnn1": _convert_rnn_stack(sd, "model1.rnn", layers, bidir, is_lstm),
            "rnn2": _convert_rnn_stack(sd, "model2.rnn", layers, bidir, is_lstm),
            "cls": cls,
        }
        return params, cfg, "BiLSTMLateFusion"

    if architecture in ("biLSTMCRF", "BiRnnCrf", "BiLSTM-CRF"):
        layers, hidden, in_dim, bidir, is_lstm = _rnn_geometry(sd, "model.rnn")
        trans = _to_np(sd["crf.transitions"])  # [C+2, C+2], T[i,j] = j -> i
        tagset = trans.shape[0] - 2
        cfg = TaggerConfig(
            embedding_dim=in_dim, hidden_dim=hidden, num_layers=layers,
            tagset_size=tagset, bidirectional=bidir, lstm=is_lstm,
            loss_fn="CrossEntropy",
        )
        params = {
            "rnn": _convert_rnn_stack(sd, "model.rnn", layers, bidir, is_lstm),
            "crf": {
                "fc_w": _to_np(sd["crf.fc.weight"]).T,
                "fc_b": _to_np(sd["crf.fc.bias"]),
                "transitions": trans,
            },
        }
        return params, cfg, "biLSTMCRF"

    if architecture == "MLP":
        # reference MLP keeps its hidden stack in `layers.{i}` and the head
        # as `classifier` (models/CRF.py:860-871)
        layers = []
        i = 0
        while f"layers.{i}.weight" in sd:
            layers.append(_linear(sd, f"layers.{i}"))
            i += 1
        cls = _linear(sd, "classifier")
        cfg = TaggerConfig(
            embedding_dim=layers[0]["w"].shape[0], hidden_dim=layers[0]["w"].shape[1],
            num_layers=i, loss_fn="BinaryCrossEntropy",
        )
        return {"layers": layers, "cls": cls}, cfg, "MLP"

    if architecture == "SheikhBiLSTM":
        # RNN wrapper stored as `lstm.rnn`, two projection heads
        # (models/CRF.py:985-990); `classification` exists in the state_dict
        # but is never used by loss/forward, so it is dropped here
        layers, hidden, in_dim, bidir, is_lstm = _rnn_geometry(sd, "lstm.rnn")
        cfg = TaggerConfig(
            embedding_dim=in_dim, hidden_dim=hidden, num_layers=layers,
            bidirectional=bidir, lstm=is_lstm, loss_fn="BinaryCrossEntropy",
        )
        params = {
            "rnn": _convert_rnn_stack(sd, "lstm.rnn", layers, bidir, is_lstm),
            "fwd_dense": _linear(sd, "forward_dense"),
            "bwd_dense": _linear(sd, "backward_dense"),
        }
        return params, cfg, "SheikhBiLSTM"

    if architecture == "SwitchBiLSTM":
        # two layouts (models/CRF.py:1062-1110): switch='lstm' has twin
        # towers `model_1`/`model_2` + one head; switch='dense' has one
        # tower `model` + twin heads `classification_1`/`classification_2`
        if any(k.startswith("model_1.") for k in sd):
            layers, hidden, in_dim, bidir, is_lstm = _rnn_geometry(sd, "model_1.rnn")
            cls = _linear(sd, "classification")
            out = cls["w"].shape[1]
            cfg = TaggerConfig(
                embedding_dim=in_dim, hidden_dim=hidden, num_layers=layers,
                tagset_size=max(out, 2), bidirectional=bidir, lstm=is_lstm,
                switch="lstm",
                loss_fn="CrossEntropy" if out > 1 else "BinaryCrossEntropy",
            )
            params = {
                "rnn1": _convert_rnn_stack(sd, "model_1.rnn", layers, bidir, is_lstm),
                "rnn2": _convert_rnn_stack(sd, "model_2.rnn", layers, bidir, is_lstm),
                "cls": cls,
            }
            return params, cfg, "SwitchBiLSTM"
        layers, hidden, in_dim, bidir, is_lstm = _rnn_geometry(sd, "model.rnn")
        cls1 = _linear(sd, "classification_1")
        cls2 = _linear(sd, "classification_2")
        out = cls1["w"].shape[1]
        cfg = TaggerConfig(
            embedding_dim=in_dim, hidden_dim=hidden, num_layers=layers,
            tagset_size=max(out, 2), bidirectional=bidir, lstm=is_lstm,
            switch="dense",
            loss_fn="CrossEntropy" if out > 1 else "BinaryCrossEntropy",
        )
        params = {
            "rnn": _convert_rnn_stack(sd, "model.rnn", layers, bidir, is_lstm),
            "cls1": cls1,
            "cls2": cls2,
        }
        return params, cfg, "SwitchBiLSTM"

    raise ValueError(
        f"no conversion rule for architecture {architecture!r}; supported: "
        "BiLSTM, BiLSTMLateFusion, biLSTMCRF, SimpleBiLSTM, MLP, "
        "SheikhBiLSTM, SwitchBiLSTM"
    )


def load_torch_checkpoint(path: str, architecture: str = None):
    """Read a torch/Lightning checkpoint file -> (params, cfg, arch)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    if not isinstance(state_dict, dict) or not any(
        re.search(r"weight_ih_l0", k) for k in state_dict
    ):
        raise ValueError(f"{path!r} does not look like a TextSegmenter checkpoint")
    return convert_state_dict(state_dict, architecture)


def convert_checkpoint(in_path: str, out_path: str, architecture: str = None):
    from multimodaltopicsegmentation_tpu.train import checkpoints as ckpt_lib

    params, cfg, arch = load_torch_checkpoint(in_path, architecture)
    ckpt_lib.save(out_path, params, cfg, arch, extra={"converted_from": in_path})
    return params, cfg, arch


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help="reference torch/Lightning checkpoint")
    ap.add_argument("output", help="framework checkpoint to write")
    ap.add_argument("--architecture", default=None,
                    help="override the architecture inferred from the keys")
    args = ap.parse_args(argv)
    _, cfg, arch = convert_checkpoint(args.input, args.output, args.architecture)
    print(f"converted {args.input} -> {args.output} ({arch}, "
          f"D={cfg.embedding_dim}, H={cfg.hidden_dim}, layers={cfg.num_layers}, "
          f"loss={cfg.loss_fn})")


if __name__ == "__main__":
    main()
