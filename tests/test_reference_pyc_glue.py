"""Structural receipts decoded from the reference's pyc-only module.

The reference's `models/longformer_noffn` ships ONLY as CPython 3.8/3.10
bytecode (/root/reference/models/__pycache__/), which this image's Python
3.12 cannot import. tools/pyc310.py reads the 3.10 pyc directly (marshal
unmarshaller + wordcode disassembler); this suite first validates that
decoder against reference modules that ship BOTH source and 3.10 bytecode
(ground truth), then pins the facts the framework's RecurrentLongformer /
checkpoint converter build on:

1. the "noffn" LongformerLayer is attention-only — it returns the bare
   self-attention context tensor; no FFN, no SelfOutput call, hence no
   output projection / residual / LayerNorm anywhere in its forward path;
2. LongformerAttention never constructs LongformerSelfOutput, so the
   checkpoint state_dict carries only `attention.self.*` tensors;
3. `external_input` feeds ONLY the key projection — queries AND values come
   from `hidden_states` (the forward-LSTM half at the call site,
   /root/reference/models/CRF.py:673-679);
4. queries are scaled by 1/sqrt(head_dim), attention-probs dropout comes
   from config.attention_probs_dropout_prob, and the per-layer window is
   config.attention_window[layer_id] // 2 per side with layer_id
   defaulting to 0 (so a window LIST uses its first element).

These receipts justify the functional longformer_noffn stub that
tests/test_reference_oracle.py::test_recurrent_longformer_oracle uses to
run the reference's own CRF.py RecurrentLongformer end to end.
"""
import glob

import pytest

from multimodaltopicsegmentation_tpu.tools.pyc310 import (
    Code,
    disassemble,
    find_code,
    iter_codes,
    load_pyc,
)

PYC_DIR = "/root/reference/models/__pycache__"


def _pyc(module: str) -> Code:
    return load_pyc(f"{PYC_DIR}/{module}.cpython-310.pyc")


def _method(root: Code, cls: str, name: str) -> Code:
    body = find_code(root, cls)
    for c in iter_codes(body):
        if c is not body and c.name == name:
            return c
    raise KeyError(f"{cls}.{name}")


def _ops(code: Code):
    """[(opname, argval)] pairs for subsequence matching."""
    return [(i.opname, i.argval) for i in disassemble(code)]


def _contains(ops, pattern):
    """True if `pattern` appears as a contiguous run in `ops`; entries are
    (opname, argval) with argval=None in the pattern meaning 'any'."""
    n = len(pattern)
    for s in range(len(ops) - n + 1):
        if all(
            ops[s + j][0] == pattern[j][0]
            and (pattern[j][1] is None or ops[s + j][1] == pattern[j][1])
            for j in range(n)
        ):
            return True
    return False


# ---------------------------------------------------------------------------
# decoder ground truth: modules shipping BOTH .py source and a 3.10 pyc
# ---------------------------------------------------------------------------


def test_unmarshaller_roundtrips_cpython_marshal():
    """The marshal v4 container/atom format is version-stable, so THIS
    interpreter's own marshal.dumps is an independent oracle for the
    unmarshal layer (ref-slot bookkeeping included — marshal interns
    repeated objects as back-references)."""
    import marshal
    import random

    from multimodaltopicsegmentation_tpu.tools.pyc310 import _Unmarshaler

    rnd = random.Random(7)

    def value(depth):
        kinds = ["int", "big", "float", "str", "bytes", "bool", "none"]
        if depth < 3:
            kinds += ["list", "tuple", "dict", "fset"]
        k = rnd.choice(kinds)
        if k == "int":
            return rnd.randint(-2**30, 2**30)
        if k == "big":
            return rnd.randint(-2**80, 2**80)  # 'l' multi-digit PyLong
        if k == "float":
            return rnd.random() * 1e6 - 5e5
        if k == "str":
            return "".join(rnd.choice("abcXYZ012 éü") for _ in range(rnd.randint(0, 12)))
        if k == "bytes":
            return bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 8)))
        if k == "bool":
            return rnd.random() < 0.5
        if k == "none":
            return None
        n = rnd.randint(0, 4)
        if k == "list":
            return [value(depth + 1) for _ in range(n)]
        if k == "tuple":
            return tuple(value(depth + 1) for _ in range(n))
        if k == "dict":
            return {f"k{i}": value(depth + 1) for i in range(n)}
        return frozenset(rnd.randint(0, 99) for _ in range(n))

    shared = ("interned-and-shared", (1, 2.5))  # forces 'r' back-references
    for trial in range(200):
        obj = [shared, value(0), shared, value(0)]
        blob = marshal.dumps(obj, 4)
        got = _Unmarshaler(blob).load()
        assert got == obj, (trial, obj)


def test_decoder_ground_truth_focal_loss():
    """focal_loss.py's source is in the repo; the decoded 3.10 bytecode of
    sigmoid_focal_loss.__call__ must read off the known math."""
    c = _pyc("focal_loss")
    call = _method(c, "sigmoid_focal_loss", "__call__")
    ops = _ops(call)
    # ce_loss = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    assert _contains(ops, [
        ("LOAD_GLOBAL", "F"),
        ("LOAD_ATTR", "binary_cross_entropy_with_logits"),
        ("LOAD_FAST", "inputs"),
        ("LOAD_FAST", "targets"),
        ("LOAD_CONST", "none"),
        ("LOAD_CONST", ("reduction",)),
        ("CALL_FUNCTION_KW", None),
        ("STORE_FAST", "ce_loss"),
    ])
    # p_t = p * targets + (1 - p) * (1 - targets)
    assert _contains(ops, [
        ("LOAD_FAST", "p"), ("LOAD_FAST", "targets"), ("BINARY_MULTIPLY", None),
        ("LOAD_CONST", 1), ("LOAD_FAST", "p"), ("BINARY_SUBTRACT", None),
        ("LOAD_CONST", 1), ("LOAD_FAST", "targets"), ("BINARY_SUBTRACT", None),
        ("BINARY_MULTIPLY", None), ("BINARY_ADD", None), ("STORE_FAST", "p_t"),
    ])
    # loss = ce_loss * (1 - p_t) ** self.gamma
    assert _contains(ops, [
        ("LOAD_FAST", "ce_loss"), ("LOAD_CONST", 1), ("LOAD_FAST", "p_t"),
        ("BINARY_SUBTRACT", None), ("LOAD_FAST", "self"),
        ("LOAD_ATTR", "gamma"), ("BINARY_POWER", None),
        ("BINARY_MULTIPLY", None), ("STORE_FAST", "loss"),
    ])
    # both reduction branches
    assert ("LOAD_CONST", "mean") in ops and ("LOAD_CONST", "sum") in ops


def test_decoder_ground_truth_crf_zoo():
    """CRF.py ships source + pyc; the decoded class inventory must match the
    source's, and a known method's structure must read off correctly."""
    c = _pyc("CRF")
    names = {cc.name for cc in iter_codes(c)}
    # NOTE: the shipped pycs predate the shipped SOURCE — they lack
    # SheikhBiLSTM/SwitchBiLSTM (and focal_loss's pyc lacks the `sigmoid`
    # ctor arg), so assert only the classes the bytecode actually carries
    for cls in ("CRF", "BiRnnCrf", "BiLSTM", "BiLSTMLateFusion",
                "Transformer_segmenter", "RecurrentLongT5Block",
                "RecurrentLongformerBlock", "RecurrentLongformer", "MLP",
                "SimpleBiLSTM", "TransformerCRF"):
        assert cls in names, cls
    # log_sum_exp = max_score + (x - max_score.unsqueeze(-1)).exp().sum(-1)
    # .log() — CRF.py:17-21; the decoded method chain must read verbatim
    lse = find_code(c, "log_sum_exp")
    ops = _ops(lse)
    assert _contains(ops, [
        ("LOAD_METHOD", "exp"), ("CALL_METHOD", None),
        ("LOAD_METHOD", "sum"), ("LOAD_CONST", -1), ("CALL_METHOD", None),
        ("LOAD_METHOD", "log"), ("CALL_METHOD", None),
        ("BINARY_ADD", None), ("RETURN_VALUE", None),
    ])


def test_decoder_full_breadth():
    """Every 3.10 pyc the reference ships decodes and disassembles end to
    end: all marshal types resolve and every opcode is in the table (the
    decoder raises on anything unknown instead of misreading). Jump targets
    must land inside their code object (arg is an instruction index)."""
    jumps = {"JUMP_FORWARD", "JUMP_ABSOLUTE", "POP_JUMP_IF_FALSE",
             "POP_JUMP_IF_TRUE", "JUMP_IF_FALSE_OR_POP",
             "JUMP_IF_TRUE_OR_POP", "JUMP_IF_NOT_EXC_MATCH", "FOR_ITER",
             "SETUP_FINALLY", "SETUP_WITH"}
    n_codes = n_instr = 0
    paths = sorted(glob.glob(f"{PYC_DIR}/*.cpython-310.pyc"))
    assert len(paths) >= 6
    for path in paths:
        for code in iter_codes(load_pyc(path)):
            n_codes += 1
            instrs = disassemble(code)
            n_instr += len(instrs)
            for ins in instrs:
                if ins.opname in jumps and ins.arg is not None:
                    if ins.opname in ("JUMP_ABSOLUTE", "POP_JUMP_IF_FALSE",
                                      "POP_JUMP_IF_TRUE",
                                      "JUMP_IF_FALSE_OR_POP",
                                      "JUMP_IF_TRUE_OR_POP",
                                      "JUMP_IF_NOT_EXC_MATCH"):
                        # absolute target, in instruction units
                        assert 0 <= 2 * ins.arg < len(code.code), (code.name, ins)
                    else:
                        # relative: target = offset + 2 + 2*arg
                        assert ins.offset + 2 + 2 * ins.arg <= len(code.code), (
                            code.name, ins)
    assert n_codes > 150 and n_instr > 10000  # measured: 196 / ~14k


# ---------------------------------------------------------------------------
# the longformer_noffn receipts
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def noffn():
    return _pyc("longformer_noffn")


def test_layer_is_attention_only(noffn):
    """LongformerLayer.forward: derives the index masks from the attention
    mask, calls self.attention(... external_input=...), and returns
    self_attn_outputs[0] — the bare context TENSOR. No intermediate/output
    (FFN) members exist anywhere in the class."""
    fwd = _method(noffn, "LongformerLayer", "forward")
    ops = _ops(fwd)
    assert _contains(ops, [
        ("LOAD_FAST", "attention_mask"), ("LOAD_CONST", 0),
        ("COMPARE_OP", "<"), ("STORE_FAST", "is_index_masked"),
    ])
    assert ("LOAD_ATTR", "attention") in ops
    kw = [a for (o, a) in ops if o == "LOAD_CONST" and isinstance(a, tuple)
          and "external_input" in a]
    assert kw, "attention is not called with an external_input kwarg"
    # returns the [0] element, not a residual/LN of it
    assert ops[-2:] == [("LOAD_FAST", "attn_output"), ("RETURN_VALUE", None)]
    assert _contains(ops, [
        ("LOAD_FAST", "self_attn_outputs"), ("LOAD_CONST", 0),
        ("BINARY_SUBSCR", None), ("STORE_FAST", "attn_output"),
    ])
    for banned in ("intermediate", "output", "ff_chunk", "LayerNorm"):
        assert banned not in fwd.names, banned
    init = _method(noffn, "LongformerLayer", "__init__")
    assert "attention" in init.names
    for banned in ("intermediate", "output", "chunk_size_feed_forward"):
        assert banned not in init.names, banned


def test_attention_never_calls_self_output(noffn):
    """LongformerAttention.forward returns (self_outputs[0],) +
    self_outputs[1:] — upstream HF's `self.output(self_outputs[0],
    hidden_states)` (output dense + dropout + residual + LayerNorm) is
    REMOVED, and __init__ never constructs LongformerSelfOutput, so the
    state_dict holds only attention.self.* tensors."""
    fwd = _method(noffn, "LongformerAttention", "forward")
    assert fwd.names == ("self",)  # the only attribute touched
    ops = _ops(fwd)
    assert ops[-1] == ("RETURN_VALUE", None)
    assert _contains(ops, [
        ("LOAD_FAST", "self_outputs"), ("LOAD_CONST", 0),
        ("BINARY_SUBSCR", None), ("BUILD_TUPLE", None),
    ])
    init = _method(noffn, "LongformerAttention", "__init__")
    assert "LongformerSelfAttention" in init.names
    assert "LongformerSelfOutput" not in init.names
    assert "output" not in init.names


def test_external_input_feeds_key_only(noffn):
    """LongformerSelfAttention.forward: `key_vectors =
    self.key(external_input.transpose(0,1))` when external_input is given,
    else self.key(hidden_states); `value_vectors =
    self.value(hidden_states)` UNCONDITIONALLY — the external stream never
    reaches the value (or query) projection."""
    fwd = _method(noffn, "LongformerSelfAttention", "forward")
    ops = _ops(fwd)
    assert _contains(ops, [
        ("LOAD_METHOD", "query"), ("LOAD_FAST", "hidden_states"),
        ("CALL_METHOD", None), ("STORE_FAST", "query_vectors"),
    ])
    assert _contains(ops, [
        ("LOAD_METHOD", "key"), ("LOAD_FAST", "external_input"),
        ("CALL_METHOD", None), ("STORE_FAST", "key_vectors"),
    ])
    assert _contains(ops, [
        ("LOAD_METHOD", "key"), ("LOAD_FAST", "hidden_states"),
        ("CALL_METHOD", None), ("STORE_FAST", "key_vectors"),
    ])
    assert _contains(ops, [
        ("LOAD_METHOD", "value"), ("LOAD_FAST", "hidden_states"),
        ("CALL_METHOD", None), ("STORE_FAST", "value_vectors"),
    ])
    assert not _contains(ops, [
        ("LOAD_METHOD", "value"), ("LOAD_FAST", "external_input"),
    ])
    assert not _contains(ops, [
        ("LOAD_METHOD", "query"), ("LOAD_FAST", "external_input"),
    ])
    # the external stream is transposed (0,1) exactly like hidden_states
    assert _contains(ops, [
        ("LOAD_FAST", "external_input"), ("LOAD_METHOD", "transpose"),
        ("LOAD_CONST", 0), ("LOAD_CONST", 1), ("CALL_METHOD", None),
        ("STORE_FAST", "external_input"),
    ])
    # query scaling by sqrt(head_dim)
    assert _contains(ops, [
        ("LOAD_GLOBAL", "math"), ("LOAD_METHOD", "sqrt"),
        ("LOAD_FAST", "self"), ("LOAD_ATTR", "head_dim"),
        ("CALL_METHOD", None), ("INPLACE_TRUE_DIVIDE", None),
        ("STORE_FAST", "query_vectors"),
    ])


def test_self_output_is_stock_hf_but_never_built(noffn):
    """LongformerSelfOutput.forward is upstream HF (dense -> dropout ->
    LayerNorm(hidden + input_tensor)) — defined, but nothing instantiates
    it (receipt for test_attention_never_calls_self_output)."""
    fwd = _method(noffn, "LongformerSelfOutput", "forward")
    ops = _ops(fwd)
    assert [o for o, _ in ops] == [
        "LOAD_FAST", "LOAD_METHOD", "LOAD_FAST", "CALL_METHOD", "STORE_FAST",
        "LOAD_FAST", "LOAD_METHOD", "LOAD_FAST", "CALL_METHOD", "STORE_FAST",
        "LOAD_FAST", "LOAD_METHOD", "LOAD_FAST", "LOAD_FAST", "BINARY_ADD",
        "CALL_METHOD", "STORE_FAST", "LOAD_FAST", "RETURN_VALUE",
    ]
    assert ("LOAD_METHOD", "dense") in ops
    assert ("LOAD_METHOD", "dropout") in ops
    assert ("LOAD_METHOD", "LayerNorm") in ops
    assert ("LOAD_FAST", "input_tensor") in ops


def test_config_plumbing(noffn):
    """LongformerSelfAttention.__init__: q/k/v (+ never-executed *_global)
    linears of hidden_size, dropout = attention_probs_dropout_prob,
    one_sided window = attention_window[layer_id] // 2; LongformerLayer's
    layer_id DEFAULTS to 0 (class-body MAKE_FUNCTION default), so the call
    site's window list uses element 0 for every block."""
    init = _method(noffn, "LongformerSelfAttention", "__init__")
    for nm in ("query", "key", "value", "query_global", "key_global",
               "value_global", "dropout", "one_sided_attn_window_size"):
        assert nm in init.names, nm
    ops = _ops(init)
    assert _contains(ops, [
        ("LOAD_ATTR", "attention_probs_dropout_prob"),
        ("LOAD_FAST", "self"), ("STORE_ATTR", "dropout"),
    ])
    assert _contains(ops, [
        ("LOAD_FAST", "attention_window"), ("LOAD_CONST", 2),
        ("BINARY_FLOOR_DIVIDE", None), ("LOAD_FAST", "self"),
        ("STORE_ATTR", "one_sided_attn_window_size"),
    ])
    # layer_id default 0: the class body's MAKE_FUNCTION for __init__ loads
    # the defaults tuple (0,) right before the code object
    body = find_code(noffn, "LongformerLayer")
    bops = _ops(body)
    idx = next(i for i, (o, a) in enumerate(bops)
               if o == "LOAD_CONST" and isinstance(a, Code)
               and a.name == "__init__")
    assert ("LOAD_CONST", (0,)) in bops[:idx]
