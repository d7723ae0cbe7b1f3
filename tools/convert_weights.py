#!/usr/bin/env python
"""Convert third-party pretrained checkpoints into this framework's formats.

Run OUTSIDE the zero-egress build environment (needs the upstream packages
and network access), then ship the outputs alongside the corpora:

  # HF wav2vec2 (no conversion file needed — load_pretrained() consumes the
  # HF checkpoint directory directly):
  python tools/convert_weights.py wav2vec2 facebook/wav2vec2-base-960h out_dir/

  # SpeechBrain x-vector / ECAPA -> npz for encoders/tdnn.py:
  python tools/convert_weights.py xvector  speechbrain/spkrec-xvect-voxceleb xvector.npz
  python tools/convert_weights.py ecapa    speechbrain/spkrec-ecapa-voxceleb ecapa.npz

  # openl3 keras weights -> npz for encoders/openl3.py:
  python tools/convert_weights.py openl3 mel128 openl3_mel128_env.npz

  # torchcrepe -> npz for encoders/crepe.py:
  python tools/convert_weights.py crepe full crepe.npz

  # SpeechBrain CRDNN VAD -> npz for encoders/crdnn_vad.py:
  python tools/convert_weights.py crdnn_vad speechbrain/vad-crdnn-libriparty vad.npz

Layouts written match the load_weights() readers in the respective modules
(conv{i}_w [k, cin, cout] / bn{i}_{scale,bias,mean,var} / proj_{w,b}).
"""
from __future__ import annotations

import sys

import numpy as np


def convert_wav2vec2(name: str, out_dir: str):
    from transformers import Wav2Vec2Model

    model = Wav2Vec2Model.from_pretrained(name)
    model.save_pretrained(out_dir)
    print(f"saved HF checkpoint to {out_dir}; load with "
          "encoders.wav2vec2.load_pretrained(out_dir)")


def _sb_get(sd: dict, *candidates: str):
    """First present key among speechbrain's wrapper-nesting variants
    (Conv1d wraps nn.Conv1d as `.conv`, BatchNorm1d wraps as `.norm`; the
    nesting depth differs across speechbrain versions)."""
    for k in candidates:
        if k in sd:
            return np.asarray(sd[k])
    raise KeyError(f"none of {candidates} in state dict ({len(sd)} keys)")


def _sb_conv(sd: dict, base: str, out_dim: int = None):
    """-> (w [K, Cin, Cout], b [Cout]) from a speechbrain Conv1d at `base`."""
    w = _sb_get(sd, f"{base}.conv.weight", f"{base}.weight")  # [Cout, Cin, K]
    try:
        b = _sb_get(sd, f"{base}.conv.bias", f"{base}.bias")
    except KeyError:
        b = np.zeros(w.shape[0], w.dtype)
    return np.transpose(w, (2, 1, 0)), b


def _sb_bn(sd: dict, base: str) -> dict:
    out = {}
    for stat, ours in (("weight", "scale"), ("bias", "bias"),
                       ("running_mean", "mean"), ("running_var", "var")):
        out[ours] = _sb_get(sd, f"{base}.norm.{stat}", f"{base}.{stat}")
    return out


def _put_tdnn(arrays: dict, prefix: str, sd: dict, conv_base: str, norm_base: str):
    arrays[f"{prefix}_w"], arrays[f"{prefix}_b"] = _sb_conv(sd, conv_base)
    for k, v in _sb_bn(sd, norm_base).items():
        arrays[f"{prefix}_bn_{k}"] = v


def map_xvector_state_dict(sd: dict) -> dict:
    """speechbrain Xvector embedding_model state_dict -> flat npz arrays
    for encoders.tdnn.xvector_load_npz. Layout: blocks = [Conv1d, ReLU,
    BatchNorm1d] x 5, then StatisticsPooling, then Linear (blocks.16 or a
    top-level fc depending on version)."""
    arrays = {}
    for i in range(5):
        _put_tdnn(arrays, f"tdnn{i}", sd, f"blocks.{3*i}", f"blocks.{3*i+2}")
    w = _sb_get(sd, "blocks.16.w.weight", "fc.w.weight", "blocks.16.weight")
    arrays["emb_w"] = np.transpose(w)
    try:
        arrays["emb_b"] = _sb_get(sd, "blocks.16.w.bias", "fc.w.bias", "blocks.16.bias")
    except KeyError:
        pass
    return arrays


def map_ecapa_state_dict(sd: dict, scale: int = 8, n_blocks: int = 3) -> dict:
    """speechbrain ECAPA_TDNN embedding_model state_dict -> flat npz arrays
    for encoders.tdnn.ecapa_load_npz.

    Published layout (speechbrain.lobes.models.ECAPA_TDNN, the
    spkrec-ecapa-voxceleb checkpoint):
      blocks.0                      TDNNBlock stem (k=5)
      blocks.{1..3}                 SERes2NetBlock:
        .tdnn1 / .tdnn2             TDNNBlock (k=1)
        .res2net_block.blocks.{i}   TDNNBlock (k=3), i in 0..scale-2
        .se_block.conv1/.conv2      SEBlock convs (k=1)
      mfa                           TDNNBlock (k=1) over the 3 block outputs
      asp.tdnn / asp.conv           attentive-stats attention (global ctx)
      asp_bn                        BatchNorm1d over the pooled stats
      fc                            Conv1d (k=1) to the 192-d embedding
    """
    arrays = {}
    _put_tdnn(arrays, "stem", sd, "blocks.0.conv", "blocks.0.norm")
    for j in range(n_blocks):
        b = f"blocks.{j + 1}"
        _put_tdnn(arrays, f"block{j}_tdnn1", sd, f"{b}.tdnn1.conv", f"{b}.tdnn1.norm")
        for i in range(scale - 1):
            _put_tdnn(arrays, f"block{j}_res2net{i}", sd,
                      f"{b}.res2net_block.blocks.{i}.conv",
                      f"{b}.res2net_block.blocks.{i}.norm")
        _put_tdnn(arrays, f"block{j}_tdnn2", sd, f"{b}.tdnn2.conv", f"{b}.tdnn2.norm")
        for se in ("se1", "se2"):
            w, bias = _sb_conv(sd, f"{b}.se_block.conv{se[-1]}")
            arrays[f"block{j}_{se}_w"] = w
            arrays[f"block{j}_{se}_b"] = bias
    _put_tdnn(arrays, "mfa", sd, "mfa.conv", "mfa.norm")
    _put_tdnn(arrays, "asp_tdnn", sd, "asp.tdnn.conv", "asp.tdnn.norm")
    arrays["asp_conv_w"], arrays["asp_conv_b"] = _sb_conv(sd, "asp.conv")
    for k, v in _sb_bn(sd, "asp_bn").items():
        arrays[f"asp_bn_{k}"] = v
    fc_w, fc_b = _sb_conv(sd, "fc")  # [1, Cin, Cout]
    arrays["fc_w"] = fc_w[0]
    arrays["fc_b"] = fc_b
    return arrays


def convert_speechbrain(kind: str, source: str, out: str):
    from speechbrain.pretrained import EncoderClassifier

    model = EncoderClassifier.from_hparams(source=source)
    sd = {k: v.detach().cpu().numpy() for k, v in model.mods.embedding_model.state_dict().items()}
    arrays = map_xvector_state_dict(sd) if kind == "xvector" else map_ecapa_state_dict(sd)
    np.savez(out, **arrays)
    print(f"wrote {out} with {len(arrays)} arrays")


def convert_openl3(input_repr: str, out: str):
    import openl3

    model = openl3.models.load_audio_embedding_model(input_repr, "env", 512)
    arrays = {}
    ci = bi = 0
    for layer in model.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            w, b = layer.get_weights() if len(layer.get_weights()) == 2 else (layer.get_weights()[0], np.zeros(layer.filters))
            arrays[f"conv{ci}_w"] = w  # [kh, kw, cin, cout] already
            arrays[f"conv{ci}_b"] = b
            ci += 1
        elif cls == "BatchNormalization":
            g, beta, mean, var = layer.get_weights()
            arrays[f"bn{bi}_scale"] = g
            arrays[f"bn{bi}_bias"] = beta
            arrays[f"bn{bi}_mean"] = mean
            arrays[f"bn{bi}_var"] = var
            bi += 1
    np.savez(out, **arrays)
    print(f"wrote {out} ({ci} convs, {bi} batchnorms)")


def map_crdnn_vad_state_dicts(
    cnn_sd: dict, rnn_sd: dict, dnn_sd: dict, pool_sizes=None
) -> dict:
    """SpeechBrain VAD module state_dicts (mods.cnn / mods.rnn / mods.dnn of
    a vad-crdnn checkpoint) -> flat npz arrays for encoders.crdnn_vad.

    Geometry is inferred from the state dicts themselves (block counts,
    channels, rnn width), so the mapper is robust to the exact hyperparams
    of the published recipe. Classification rules per module:
      cnn: 4-d weights are conv kernels ([Cout,Cin,kt,kf] -> [kt,kf,Cin,Cout]);
           the remaining weight/bias pairs in each block are the LayerNorm.
      rnn: torch LSTM naming (weight_ih_l{j}[_reverse], ...); the two torch
           biases are summed into the single-bias layout ops/rnn.py uses.
      dnn: 2-d weights are Linear layers ([out,in] -> [in,out]); weights with
           sibling running stats are BatchNorm1d; the final Linear (width 1)
           is the sigmoid output head.
    Pool factors are not parameters; pass pool_sizes when the recipe differs
    from the default frequency max-pool of 2 per block.
    """
    arrays = {}

    # --- cnn ---------------------------------------------------------------
    conv_ws = [(k, v) for k, v in cnn_sd.items()
               if k.endswith("weight") and np.ndim(v) == 4]
    if pool_sizes is None:
        pool_sizes = [2] * len(conv_ws)
    # the CNN-block norm is assumed LayerNorm (speechbrain's published VAD
    # recipe); a BatchNorm checkpoint would alias its weight/bias onto LN
    # params and silently drop running stats, so refuse it outright
    bn_keys = [k for k in cnn_sd if k.endswith(("running_mean", "running_var"))]
    if bn_keys:
        raise ValueError(
            f"cnn: found BatchNorm running stats ({bn_keys[:2]}...) — this "
            "converter maps CNN-block norms as LayerNorm; inspect the "
            "checkpoint's norm type before converting"
        )
    ln_ws = [(k, v) for k, v in cnn_sd.items()
             if k.endswith("weight") and np.ndim(v) in (1, 2)]
    if len(ln_ws) != len(conv_ws):
        raise ValueError(
            f"cnn: {len(conv_ws)} convs but {len(ln_ws)} norm layers — "
            "unexpected block structure, inspect the state dict"
        )
    for i, ((wk, w), (lk, lw)) in enumerate(zip(conv_ws, ln_ws)):
        w = np.asarray(w)
        arrays[f"cnn{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        bk = wk[: -len("weight")] + "bias"
        arrays[f"cnn{i}_b"] = (
            np.asarray(cnn_sd[bk]) if bk in cnn_sd else np.zeros(w.shape[0], w.dtype)
        )
        arrays[f"cnn{i}_ln_scale"] = np.asarray(lw)
        arrays[f"cnn{i}_ln_bias"] = np.asarray(cnn_sd[lk[: -len("weight")] + "bias"])
        arrays[f"cnn{i}_pool"] = np.asarray(pool_sizes[i], np.int32)

    # --- rnn ---------------------------------------------------------------
    def _rnn_key(stem: str):
        hits = [k for k in rnn_sd if k.endswith(stem)]
        if len(hits) != 1:
            raise KeyError(f"rnn: expected exactly one *{stem}, got {hits}")
        return rnn_sd[hits[0]]

    n_layers = len({k.rsplit("_l", 1)[-1].replace("_reverse", "")
                    for k in rnn_sd if "weight_ih_l" in k})
    for j in range(n_layers):
        for d, suff in (("fwd", ""), ("bwd", "_reverse")):
            w_ih = np.asarray(_rnn_key(f"weight_ih_l{j}{suff}"))
            w_hh = np.asarray(_rnn_key(f"weight_hh_l{j}{suff}"))
            b = np.asarray(_rnn_key(f"bias_ih_l{j}{suff}")) + np.asarray(
                _rnn_key(f"bias_hh_l{j}{suff}")
            )
            arrays[f"rnn_l{j}_{d}_w_ih"] = np.transpose(w_ih)
            arrays[f"rnn_l{j}_{d}_w_hh"] = np.transpose(w_hh)
            arrays[f"rnn_l{j}_{d}_b"] = b

    # --- dnn ---------------------------------------------------------------
    lin_ws = [(k, v) for k, v in dnn_sd.items()
              if k.endswith("weight") and np.ndim(v) == 2]
    bn_bases = [k[: -len("running_mean")] for k in dnn_sd if k.endswith("running_mean")]
    if len(lin_ws) != len(bn_bases) + 1:
        raise ValueError(
            f"dnn: {len(lin_ws)} linears with {len(bn_bases)} batchnorms — "
            "expected one un-normalized output head"
        )
    for j, (wk, w) in enumerate(lin_ws[:-1]):
        arrays[f"dnn{j}_w"] = np.transpose(np.asarray(w))
        bk = wk[: -len("weight")] + "bias"
        arrays[f"dnn{j}_b"] = (
            np.asarray(dnn_sd[bk]) if bk in dnn_sd else np.zeros(w.shape[0], w.dtype)
        )
        base = bn_bases[j]
        for stat, ours in (("weight", "scale"), ("bias", "bias"),
                           ("running_mean", "mean"), ("running_var", "var")):
            arrays[f"dnn{j}_bn_{ours}"] = np.asarray(dnn_sd[base + stat])
    wk, w = lin_ws[-1]
    w = np.asarray(w)
    if w.shape[0] != 1:
        raise ValueError(f"dnn output head has width {w.shape[0]}, expected 1")
    arrays["out_w"] = np.transpose(w)
    bk = wk[: -len("weight")] + "bias"
    arrays["out_b"] = (
        np.asarray(dnn_sd[bk]) if bk in dnn_sd else np.zeros(1, w.dtype)
    )
    return arrays


def convert_crdnn_vad(source: str, out: str):
    from speechbrain.pretrained import VAD

    vad = VAD.from_hparams(source=source)
    sds = {
        name: {k: v.detach().cpu().numpy()
               for k, v in getattr(vad.mods, name).state_dict().items()}
        for name in ("cnn", "rnn", "dnn")
    }
    arrays = map_crdnn_vad_state_dicts(sds["cnn"], sds["rnn"], sds["dnn"])
    np.savez(out, **arrays)
    print(f"wrote {out} with {len(arrays)} arrays")


def map_crepe_state_dict(sd: dict, n_layers: int = 6) -> dict:
    """torchcrepe Crepe state_dict (conv{i}.weight [Cout,Cin,K,1] +
    conv{i}_BN stats) -> flat npz arrays for encoders.crepe.load_weights
    (conv kernels as [K, Cin, Cout])."""
    arrays = {}
    for i in range(n_layers):
        arrays[f"conv{i}_w"] = np.transpose(
            np.asarray(sd[f"conv{i+1}.weight"])[..., 0], (2, 1, 0)
        )
        arrays[f"conv{i}_b"] = np.asarray(sd[f"conv{i+1}.bias"])
        for stat, ours in (("weight", "scale"), ("bias", "bias"),
                           ("running_mean", "mean"), ("running_var", "var")):
            arrays[f"bn{i}_{ours}"] = np.asarray(sd[f"conv{i+1}_BN.{stat}"])
    return arrays


def convert_crepe(capacity: str, out: str):
    import torchcrepe

    torchcrepe.load.model("cpu", capacity)
    sd = {k: v.detach().cpu().numpy() for k, v in torchcrepe.infer.model.state_dict().items()}
    np.savez(out, **map_crepe_state_dict(sd))
    print(f"wrote {out}")


if __name__ == "__main__":
    kind = sys.argv[1]
    if kind == "wav2vec2":
        convert_wav2vec2(sys.argv[2], sys.argv[3])
    elif kind in ("xvector", "ecapa"):
        convert_speechbrain(kind, sys.argv[2], sys.argv[3])
    elif kind == "openl3":
        convert_openl3(sys.argv[2], sys.argv[3])
    elif kind == "crepe":
        convert_crepe(sys.argv[2], sys.argv[3])
    elif kind == "crdnn_vad":
        convert_crdnn_vad(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(__doc__)
