"""Tracing / profiling hooks.

The reference has no profiler at all (SURVEY.md §5); this is the TPU
framework's observability layer:

- `stage(name)`: wall-clock context manager accumulating per-stage totals
  (extraction, encode, train-epoch, decode, metrics);
- `device_trace(logdir)`: jax.profiler trace context producing TensorBoard-
  compatible XLA traces;
- `report()`: per-stage totals for logs/results.

Enabled from the CLIs via MTS_PROFILE=1 / MTS_TRACE_DIR=<dir>.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

_totals = defaultdict(float)
_counts = defaultdict(int)


@contextlib.contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _totals[name] += dt
        _counts[name] += 1


@contextlib.contextmanager
def device_trace(logdir: str = None):
    logdir = logdir or os.environ.get("MTS_TRACE_DIR")
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def report() -> dict:
    return {
        name: {"total_s": _totals[name], "calls": _counts[name]}
        for name in sorted(_totals)
    }


def reset():
    _totals.clear()
    _counts.clear()


def maybe_print_report():
    if os.environ.get("MTS_PROFILE") == "1" and _totals:
        print("=== stage timings ===")
        for name, info in report().items():
            print(f"{name:30s} {info['total_s']:8.3f} s  ({info['calls']} calls)")
