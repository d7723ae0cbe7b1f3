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


def convert_speechbrain(kind: str, source: str, out: str):
    from speechbrain.pretrained import EncoderClassifier

    model = EncoderClassifier.from_hparams(source=source)
    sd = {k: v.detach().cpu().numpy() for k, v in model.mods.embedding_model.state_dict().items()}
    arrays = {}
    if kind == "xvector":
        # speechbrain Xvector: blocks.{2i}.conv.weight [out, in, k]
        for i in range(5):
            w = sd[f"blocks.{3*i}.conv.conv.weight"] if f"blocks.{3*i}.conv.conv.weight" in sd else sd[f"blocks.{3*i}.conv.weight"]
            arrays[f"tdnn{i}_w"] = np.transpose(w, (2, 1, 0))
            arrays[f"tdnn{i}_b"] = sd.get(f"blocks.{3*i}.conv.bias", np.zeros(w.shape[0]))
            for stat, ours in (("weight", "scale"), ("bias", "bias"),
                               ("running_mean", "mean"), ("running_var", "var")):
                arrays[f"tdnn{i}_bn_{ours}"] = sd[f"blocks.{3*i+2}.norm.{stat}"]
        arrays["emb_w"] = np.transpose(sd["blocks.16.w.weight"]) if "blocks.16.w.weight" in sd else np.transpose(sd["fc.w.weight"])
    else:
        raise SystemExit(
            "ECAPA key mapping depends on the speechbrain version; dump "
            "model.mods.embedding_model.state_dict() and map onto "
            "encoders/tdnn.py ecapa_init() keys (stem/blocks/mfa/att/emb)."
        )
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


def convert_crepe(capacity: str, out: str):
    import torchcrepe

    torchcrepe.load.model("cpu", capacity)
    sd = {k: v.detach().cpu().numpy() for k, v in torchcrepe.infer.model.state_dict().items()}
    arrays = {}
    for i in range(6):
        arrays[f"conv{i}_w"] = np.transpose(sd[f"conv{i+1}.weight"][..., 0], (2, 1, 0))
        arrays[f"conv{i}_b"] = sd[f"conv{i+1}.bias"]
        for stat, ours in (("weight", "scale"), ("bias", "bias"),
                           ("running_mean", "mean"), ("running_var", "var")):
            arrays[f"bn{i}_{ours}"] = sd[f"conv{i+1}_BN.{stat}"]
    np.savez(out, **arrays)
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
    else:
        raise SystemExit(__doc__)
