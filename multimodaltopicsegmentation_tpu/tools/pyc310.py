"""Minimal CPython 3.10 .pyc reader: unmarshal + wordcode disassembler.

Purpose: the reference vendors its modified Longformer layer ONLY as
bytecode (`/root/reference/models/__pycache__/longformer_noffn.cpython-310.pyc`
— the `.py` source is absent from the repo), and this image's Python 3.12
cannot import 3.10 bytecode (magic-number mismatch). This module reads the
3.10 pyc directly — a from-scratch unmarshaller for the stable marshal v4
format plus a table-driven disassembler for 3.10 wordcode — so the layer's
residual/LayerNorm glue can be recovered and oracle-tested instead of
assumed (closing the one "cannot be oracle-tested" hole in README.md).

Correctness strategy: the decoder REFUSES anything it does not know
(unknown marshal type byte, unknown opcode) instead of guessing, and
tests/test_reference_pyc_glue.py first validates it against reference
modules that ship BOTH `.py` source and a 3.10 pyc (focal_loss, CRF) —
ground truth for names/consts/structure — before trusting it on the
source-less module.

This reads and analyzes the reference's public bytecode; no reference
code is copied into the framework (the analysis OUTPUT is assertions in
a test).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

MAGIC_310 = 3439  # CPython 3.10 (accept the whole 3.10 range below)


# ---------------------------------------------------------------------------
# marshal v4 unmarshaller (the subset code objects use)
# ---------------------------------------------------------------------------


@dataclass
class Code:
    """Decoded code object (3.10 field order)."""

    argcount: int
    posonlyargcount: int
    kwonlyargcount: int
    nlocals: int
    stacksize: int
    flags: int
    code: bytes
    consts: tuple
    names: Tuple[str, ...]
    varnames: Tuple[str, ...]
    freevars: Tuple[str, ...]
    cellvars: Tuple[str, ...]
    filename: str
    name: str
    firstlineno: int
    linetable: bytes

    def __repr__(self):  # keep reprs short in test failures
        return f"<Code {self.name} @{self.filename}:{self.firstlineno}>"


class _Unmarshaler:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs: List[Any] = []

    def _read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated marshal data")
        self.pos += n
        return b

    def _i32(self) -> int:
        return struct.unpack("<i", self._read(4))[0]

    def _u8(self) -> int:
        return self._read(1)[0]

    def load(self) -> Any:
        t = self._u8()
        ref_flag = bool(t & 0x80)
        t = chr(t & 0x7F)
        # objects that self-reference (code, containers) must claim their
        # ref slot BEFORE loading children
        if t in "[{<>c()":
            return self._load_container(t, ref_flag)
        obj = self._load_atom(t)
        if ref_flag:
            self.refs.append(obj)
        return obj

    def _load_atom(self, t: str) -> Any:
        if t == "0":
            return None  # TYPE_NULL (only inside dicts as terminator)
        if t == "N":
            return None
        if t == "F":
            return False
        if t == "T":
            return True
        if t == "S":
            return StopIteration
        if t == ".":
            return Ellipsis
        if t == "i":
            return self._i32()
        if t == "l":  # PyLong: int32 count of 15-bit digits (sign = count)
            n = self._i32()
            val, shift = 0, 0
            for _ in range(abs(n)):
                val |= struct.unpack("<H", self._read(2))[0] << shift
                shift += 15
            return -val if n < 0 else val
        if t == "g":  # binary float
            return struct.unpack("<d", self._read(8))[0]
        if t == "y":  # binary complex
            re_, im = struct.unpack("<dd", self._read(16))
            return complex(re_, im)
        if t == "s":  # bytes
            return self._read(self._i32())
        if t in "zZ":  # short ascii (interned / plain): 1-byte length
            return self._read(self._u8()).decode("ascii")
        if t in "aA":  # ascii: int32 length
            return self._read(self._i32()).decode("ascii")
        if t == "u" or t == "t":  # unicode / interned: int32 utf8 length
            return self._read(self._i32()).decode("utf-8")
        if t == "r":  # back-reference
            return self.refs[self._i32()]
        raise ValueError(f"unknown marshal type byte {t!r} at {self.pos - 1}")

    def _load_container(self, t: str, ref_flag: bool) -> Any:
        # reserve the ref slot first (marshal numbers refs pre-order)
        slot = None
        if ref_flag:
            slot = len(self.refs)
            self.refs.append(None)

        if t in "()":  # tuple (int32 count) / small tuple (uint8 count)
            n = self._i32() if t == "(" else self._u8()
            obj = tuple(self.load() for _ in range(n))
        elif t == "[":
            n = self._i32()
            obj = [self.load() for _ in range(n)]
        elif t == "{":
            d = {}
            while True:
                # NULL byte terminates
                if self.data[self.pos] & 0x7F == ord("0"):
                    self.pos += 1
                    break
                key = self.load()
                d[key] = self.load()
            obj = d
        elif t in "<>":
            n = self._i32()
            obj = frozenset(self.load() for _ in range(n))
        elif t == "c":
            obj = Code(
                argcount=self._i32(),
                posonlyargcount=self._i32(),
                kwonlyargcount=self._i32(),
                nlocals=self._i32(),
                stacksize=self._i32(),
                flags=self._i32(),
                code=self.load(),
                consts=tuple(self.load()),
                names=tuple(self.load()),
                varnames=tuple(self.load()),
                freevars=tuple(self.load()),
                cellvars=tuple(self.load()),
                filename=self.load(),
                name=self.load(),
                firstlineno=self._i32(),
                linetable=self.load(),
            )
        else:  # pragma: no cover - gated by caller
            raise ValueError(f"unhandled container {t!r}")

        if slot is not None:
            self.refs[slot] = obj
        return obj


def load_pyc(path: str) -> Code:
    """Read a CPython 3.10 .pyc and return its module code object."""
    with open(path, "rb") as f:
        data = f.read()
    magic = struct.unpack("<H", data[:2])[0]
    if data[2:4] != b"\r\n" or not (3430 <= magic <= 3439):
        raise ValueError(f"not a CPython 3.10 pyc (magic {magic})")
    # header: magic(4) flags(4) mtime/hash(8)
    code = _Unmarshaler(data[16:]).load()
    if not isinstance(code, Code):
        raise ValueError("pyc toplevel is not a code object")
    return code


# ---------------------------------------------------------------------------
# 3.10 wordcode disassembler
# ---------------------------------------------------------------------------

# CPython 3.10 opcode numbers (Lib/opcode.py). Deliberately NOT exhaustive —
# any opcode outside this table raises, so a wrong assumption fails loudly
# rather than silently misreading the stream.
OPNAMES_310: Dict[int, str] = {
    1: "POP_TOP", 2: "ROT_TWO", 3: "ROT_THREE", 4: "DUP_TOP",
    5: "DUP_TOP_TWO", 6: "ROT_FOUR", 9: "NOP",
    10: "UNARY_POSITIVE", 11: "UNARY_NEGATIVE", 12: "UNARY_NOT",
    15: "UNARY_INVERT",
    16: "BINARY_MATRIX_MULTIPLY", 17: "INPLACE_MATRIX_MULTIPLY",
    19: "BINARY_POWER", 20: "BINARY_MULTIPLY", 22: "BINARY_MODULO",
    23: "BINARY_ADD", 24: "BINARY_SUBTRACT", 25: "BINARY_SUBSCR",
    26: "BINARY_FLOOR_DIVIDE", 27: "BINARY_TRUE_DIVIDE",
    28: "INPLACE_FLOOR_DIVIDE", 29: "INPLACE_TRUE_DIVIDE",
    30: "GET_LEN", 31: "MATCH_MAPPING", 32: "MATCH_SEQUENCE",
    33: "MATCH_KEYS", 34: "COPY_DICT_WITHOUT_KEYS",
    49: "WITH_EXCEPT_START", 50: "GET_AITER", 51: "GET_ANEXT",
    52: "BEFORE_ASYNC_WITH", 54: "END_ASYNC_FOR",
    55: "INPLACE_ADD", 56: "INPLACE_SUBTRACT", 57: "INPLACE_MULTIPLY",
    59: "INPLACE_MODULO", 60: "STORE_SUBSCR", 61: "DELETE_SUBSCR",
    62: "BINARY_LSHIFT", 63: "BINARY_RSHIFT", 64: "BINARY_AND",
    65: "BINARY_XOR", 66: "BINARY_OR", 67: "INPLACE_POWER",
    68: "GET_ITER", 69: "GET_YIELD_FROM_ITER", 70: "PRINT_EXPR",
    71: "LOAD_BUILD_CLASS", 72: "YIELD_FROM", 73: "GET_AWAITABLE",
    74: "LOAD_ASSERTION_ERROR", 75: "INPLACE_LSHIFT",
    76: "INPLACE_RSHIFT", 77: "INPLACE_AND", 78: "INPLACE_XOR",
    79: "INPLACE_OR", 82: "LIST_TO_TUPLE", 83: "RETURN_VALUE",
    84: "IMPORT_STAR", 85: "SETUP_ANNOTATIONS", 86: "YIELD_VALUE",
    87: "POP_BLOCK", 89: "POP_EXCEPT",
    90: "STORE_NAME", 91: "DELETE_NAME", 92: "UNPACK_SEQUENCE",
    93: "FOR_ITER", 94: "UNPACK_EX", 95: "STORE_ATTR",
    96: "DELETE_ATTR", 97: "STORE_GLOBAL", 98: "DELETE_GLOBAL",
    99: "ROT_N", 100: "LOAD_CONST", 101: "LOAD_NAME",
    102: "BUILD_TUPLE", 103: "BUILD_LIST", 104: "BUILD_SET",
    105: "BUILD_MAP", 106: "LOAD_ATTR", 107: "COMPARE_OP",
    108: "IMPORT_NAME", 109: "IMPORT_FROM", 110: "JUMP_FORWARD",
    111: "JUMP_IF_FALSE_OR_POP", 112: "JUMP_IF_TRUE_OR_POP",
    113: "JUMP_ABSOLUTE", 114: "POP_JUMP_IF_FALSE",
    115: "POP_JUMP_IF_TRUE", 116: "LOAD_GLOBAL",
    117: "IS_OP", 118: "CONTAINS_OP", 119: "RERAISE",
    121: "JUMP_IF_NOT_EXC_MATCH", 122: "SETUP_FINALLY",
    124: "LOAD_FAST", 125: "STORE_FAST", 126: "DELETE_FAST",
    129: "GEN_START", 130: "RAISE_VARARGS", 131: "CALL_FUNCTION",
    132: "MAKE_FUNCTION", 133: "BUILD_SLICE", 135: "LOAD_CLOSURE",
    136: "LOAD_DEREF", 137: "STORE_DEREF", 138: "DELETE_DEREF",
    141: "CALL_FUNCTION_KW", 142: "CALL_FUNCTION_EX",
    143: "SETUP_WITH", 144: "EXTENDED_ARG", 145: "LIST_APPEND",
    146: "SET_ADD", 147: "MAP_ADD", 148: "LOAD_CLASSDEREF",
    152: "MATCH_CLASS", 154: "SETUP_ASYNC_WITH", 155: "FORMAT_VALUE",
    156: "BUILD_CONST_KEY_MAP", 157: "BUILD_STRING",
    160: "LOAD_METHOD", 161: "CALL_METHOD", 162: "LIST_EXTEND",
    163: "SET_UPDATE", 164: "DICT_MERGE", 165: "DICT_UPDATE",
}
HAVE_ARGUMENT = 90
CMP_OPS = ("<", "<=", "==", "!=", ">", ">=")


@dataclass
class Instr:
    offset: int
    opname: str
    arg: Optional[int]
    argval: Any = None

    def __repr__(self):
        if self.arg is None:
            return f"{self.offset:4d} {self.opname}"
        av = "" if self.argval is None else f" ({self.argval!r})"
        return f"{self.offset:4d} {self.opname} {self.arg}{av}"


def disassemble(code: Code) -> List[Instr]:
    """3.10 wordcode -> Instr list; resolves const/name/local/cmp argvals.
    Raises on any opcode not in the table (never misreads silently)."""
    out: List[Instr] = []
    ext = 0
    b = code.code
    for off in range(0, len(b), 2):
        op, raw = b[off], b[off + 1]
        name = OPNAMES_310.get(op)
        if name is None:
            raise ValueError(f"unknown 3.10 opcode {op} at offset {off} in {code.name}")
        if name == "EXTENDED_ARG":
            ext = (ext | raw) << 8
            continue
        if op < HAVE_ARGUMENT:
            out.append(Instr(off, name, None))
            ext = 0
            continue
        arg = ext | raw
        ext = 0
        argval: Any = None
        if name == "LOAD_CONST":
            argval = code.consts[arg]
        elif name in ("LOAD_NAME", "STORE_NAME", "DELETE_NAME", "LOAD_GLOBAL",
                      "STORE_GLOBAL", "DELETE_GLOBAL", "LOAD_ATTR",
                      "STORE_ATTR", "DELETE_ATTR", "LOAD_METHOD",
                      "IMPORT_NAME", "IMPORT_FROM"):
            argval = code.names[arg]
        elif name in ("LOAD_FAST", "STORE_FAST", "DELETE_FAST"):
            argval = code.varnames[arg]
        elif name in ("LOAD_DEREF", "STORE_DEREF", "DELETE_DEREF",
                      "LOAD_CLOSURE", "LOAD_CLASSDEREF"):
            cells = tuple(code.cellvars) + tuple(code.freevars)
            argval = cells[arg]
        elif name == "COMPARE_OP":
            argval = CMP_OPS[arg]
        out.append(Instr(off, name, arg, argval))
    return out


# ---------------------------------------------------------------------------
# navigation helpers
# ---------------------------------------------------------------------------


def iter_codes(code: Code):
    """Yield code and every nested code object (depth-first)."""
    yield code
    for c in code.consts:
        if isinstance(c, Code):
            yield from iter_codes(c)


def find_code(root: Code, qualpath: str) -> Code:
    """Find a nested code object by dotted name path, e.g.
    'LongformerSelfOutput.forward' (class bodies are code objects whose
    name is the class name; methods are consts of the class body)."""
    parts = qualpath.split(".")
    cur = root
    for part in parts:
        nxt = None
        for c in iter_codes(cur):
            if c is not cur and c.name == part:
                nxt = c
                break
        if nxt is None:
            raise KeyError(f"{part!r} not found under {cur.name!r}")
        cur = nxt
    return cur


def pretty(code: Code) -> str:
    return "\n".join(map(repr, disassemble(code)))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Disassemble a CPython 3.10 .pyc (list code objects, or "
        "dump one by dotted path, e.g. LongformerSelfOutput.forward)"
    )
    ap.add_argument("pyc", help="path to a cpython-310 .pyc")
    ap.add_argument("path", nargs="?", default=None,
                    help="dotted code path to disassemble (default: list)")
    args = ap.parse_args(argv)
    root = load_pyc(args.pyc)
    if args.path is None:
        for c in iter_codes(root):
            print(f"{c.name}  args={c.varnames[:c.argcount]}")
    else:
        print(pretty(find_code(root, args.path)))


if __name__ == "__main__":
    main()
