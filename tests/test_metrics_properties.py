"""Property-based invariants for the segmentation metrics (hypothesis)."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from multimodaltopicsegmentation_tpu.eval import metrics as M


def boundary_vec(min_len=6, max_len=80):
    return st.lists(
        st.integers(min_value=0, max_value=1), min_size=min_len, max_size=max_len
    )


@settings(max_examples=150, deadline=None)
@given(boundary_vec())
def test_pk_wd_zero_on_identical(b):
    assert M.compute_Pk(list(b), list(b)) == 0.0
    try:
        assert M.compute_window_diff(list(b), list(b)) == 0.0
    except AssertionError as e:
        if "window" not in str(e):
            raise


@settings(max_examples=150, deadline=None)
@given(boundary_vec(), boundary_vec())
def test_pk_wd_bounded(h, t):
    n = min(len(h), len(t))
    h, t = list(h[:n]), list(t[:n])
    pk = M.compute_Pk(h, t)
    assert 0.0 <= pk <= 1.0
    try:
        wd = M.compute_window_diff(h, t)
        assert 0.0 <= wd <= 1.0
        # WindowDiff >= Pk does NOT hold universally, but both stay in range
    except AssertionError as e:
        if "window" not in str(e) and "document" not in str(e):
            raise


@settings(max_examples=150, deadline=None)
@given(boundary_vec(), boundary_vec())
def test_winpr_bounds_and_perfection(h, t):
    n = min(len(h), len(t))
    h, t = list(h[:n]), list(t[:n])
    p, r, f1 = M.win_pr(t, h)
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f1 <= 1.0
    if sum(t) > 0:
        pp, rr, ff = M.win_pr(t, t)
        assert (pp, rr, ff) == (1.0, 1.0, 1.0)


@settings(max_examples=150, deadline=None)
@given(boundary_vec(), boundary_vec())
def test_b_measure_bounds_and_symmetric_similarity(h, t):
    n = min(len(h), len(t))
    h, t = list(h[:n]), list(t[:n])
    bp, br, bf1, b = M.b_measure(h, t)
    for v in (bp, br, bf1, b):
        assert 0.0 <= v <= 1.0
    # boundary similarity is symmetric in its two segmentations
    # (up to float summation order of the transposition weights)
    hm = M.get_boundaries([*h[:-1], 1])
    tm = M.get_boundaries([*t[:-1], 1])
    assert M.boundary_similarity(hm, tm, n_t=10) == pytest.approx(
        M.boundary_similarity(tm, hm, n_t=10), abs=1e-12
    )
    # identical -> perfect, provided there is at least one internal boundary
    # (with none, P/R are 0/0 -> 0.0, matching segeval's empty matrix)
    if sum(t[:-1]) > 0:
        assert M.b_measure(t, t) == (1.0, 1.0, 1.0, 1.0)
    else:
        assert M.b_measure(t, t)[3] == 1.0  # similarity is still perfect


@settings(max_examples=100, deadline=None)
@given(boundary_vec())
def test_boundary_f1_self(t):
    assert M.boundary_f1(t, t) in (0.0, 1.0)  # 0 only when no positives
    if sum(t) > 0:
        assert M.boundary_f1(t, t) == 1.0
