"""Shared functional stub for the reference's pyc-only longformer_noffn.

Both reference-oracle modules install this into sys.modules before importing
the reference's packages (module state is process-global: whichever fixture
runs first binds `models.RestrictedTransformerLayer`'s
`from models.longformer_noffn import LongformerLayer` permanently, so the
two files MUST install the same, fully functional stub — an inert one would
break test_recurrent_longformer_oracle whenever the data-oracle file runs
first).

The stub is HF's own importable LongformerSelfAttention wrapped in EXACTLY
the glue recovered from the vendored module's 3.10 bytecode, fact for fact
pinned by tests/test_reference_pyc_glue.py:
- LongformerLayer.forward derives is_index_masked/global from the attention
  mask, runs attention only, and returns the bare context TENSOR (no
  SelfOutput: no o-proj, no residual, no LayerNorm);
- external_input feeds ONLY the key projection (transposed (0,1) like
  hidden_states); queries and values come from hidden_states;
- layer_id defaults to 0, so attention_window lists use element 0.
The module layout (attention.self.{query,key,value}) matches the vendored
state_dict, so checkpoints saved through this stub have the reference
layout.
"""
import types

import torch


def make_noffn_stub():
    from transformers.models.longformer.modeling_longformer import (
        LongformerSelfAttention,
    )

    class _KeyFromExternal(torch.nn.Module):
        def __init__(self, lin, src):
            super().__init__()
            self.lin = lin
            self.src = src.transpose(0, 1)

        def forward(self, _x):
            return self.lin(self.src)

    class LongformerLayer(torch.nn.Module):
        def __init__(self, config, layer_id=0):
            super().__init__()
            attention = torch.nn.Module()
            attention.add_module("self", LongformerSelfAttention(config, layer_id))
            self.attention = attention

        def forward(self, hidden_states=None, attention_mask=None,
                    external_input=None):
            att = getattr(self.attention, "self")
            is_index_masked = attention_mask < 0
            is_index_global_attn = attention_mask > 0
            orig_key = att.key
            if external_input is not None:
                att.key = _KeyFromExternal(orig_key, external_input)
            try:
                outs = att(
                    hidden_states,
                    attention_mask=attention_mask,
                    layer_head_mask=None,
                    is_index_masked=is_index_masked,
                    is_index_global_attn=is_index_global_attn,
                    is_global_attn=False,
                )
            finally:
                att.key = orig_key
            return outs[0]

    stub = types.ModuleType("models.longformer_noffn")
    stub.LongformerLayer = LongformerLayer
    return stub
