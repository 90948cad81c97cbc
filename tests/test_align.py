"""CTC forced-alignment parity: the numpy Viterbi DP vs an independent
brute-force path enumerator (exhaustive over the blank-interleaved lattice),
plus the segment/span post-pass contracts and the Spark mapInPandas surface.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dataflow_mm_spark.operators.align import (
    align_row,
    align_spans,
    ctc_forced_align,
    merge_repeats,
    token_spans,
)


def brute_force_best(em: np.ndarray, targets: list[int], blank: int = 0):
    """Enumerate EVERY valid CTC forced path and return the max score —
    independent of the DP (no shared code, no trellis)."""
    T, _ = em.shape
    L = len(targets)
    S = 2 * L + 1
    ext = [blank] * S
    for i, t in enumerate(targets):
        ext[2 * i + 1] = t
    best = [-math.inf]

    def rec(t: int, s: int, acc: float):
        acc += em[t, ext[s]]
        if t == T - 1:
            if s >= S - 2:
                best[0] = max(best[0], acc)
            return
        rec(t + 1, s, acc)
        if s + 1 < S:
            rec(t + 1, s + 1, acc)
        if s + 2 < S and ext[s + 2] != blank and ext[s + 2] != ext[s]:
            rec(t + 1, s + 2, acc)

    rec(0, 0, 0.0)
    if S > 1:
        rec(0, 1, 0.0)
    return best[0]


def collapse(path: np.ndarray, blank: int = 0) -> list[int]:
    out: list[int] = []
    prev = None
    for p in path:
        if p != prev and p != blank:
            out.append(int(p))
        prev = p
    return out


def test_dp_matches_bruteforce_random():
    rng = np.random.default_rng(7)
    for trial in range(200):
        V = 4
        T = int(rng.integers(2, 9))
        L = int(rng.integers(1, min(T, 4) + 1))
        targets = rng.integers(1, V, size=L).tolist()
        min_T = L + sum(
            1 for i in range(1, L) if targets[i] == targets[i - 1]
        )
        em = rng.normal(size=(T, V))
        if T < min_T:
            with pytest.raises(ValueError):
                ctc_forced_align(em, targets)
            continue
        path, scores = ctc_forced_align(em, targets)
        got = scores.sum()
        want = brute_force_best(em, targets)
        assert got == pytest.approx(want, abs=1e-9), (trial, targets, T)
        assert collapse(path) == targets
        assert np.allclose(scores, em[np.arange(T), path])


def test_dp_vectorized_branch_matches_scalar():
    # S >= 32 states forces the numpy-shift branch; replay the same case
    # through the scalar branch by monkeypatching the threshold.
    import dataflow_mm_spark.operators.align as al

    rng = np.random.default_rng(11)
    V, L, T = 9, 20, 90  # S = 41
    targets = rng.integers(1, V, size=L).tolist()
    em = rng.normal(size=(T, V))
    path_v, sc_v = ctc_forced_align(em, targets)
    old = al._VEC_MIN_STATES
    al._VEC_MIN_STATES = 10_000
    try:
        path_s, sc_s = ctc_forced_align(em, targets)
    finally:
        al._VEC_MIN_STATES = old
    assert np.array_equal(path_v, path_s)
    assert np.allclose(sc_v, sc_s)
    assert collapse(path_v) == targets


def test_merge_repeats_end_inclusive():
    path = np.array([0, 2, 2, 0, 0, 3, 0])
    scores = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7])
    segs = merge_repeats(path, scores)
    assert [(s[0], s[1], s[2]) for s in segs] == [
        (0, 0, 0),
        (2, 1, 2),
        (0, 3, 4),
        (3, 5, 5),
        (0, 6, 6),
    ]
    assert segs[1][3] == pytest.approx(0.5)


def test_token_spans_blank_midpoint_padding():
    # layout: b t1 t1 b b b t2 b  →  blanks (3,5) midpoint 4; edges absorb
    path = np.array([0, 1, 1, 0, 0, 0, 2, 0])
    scores = np.zeros(8)
    segs = merge_repeats(path, scores)
    spans = token_spans([1, 2], segs, stride_ms=20)
    # first span: leading blank absorbed fully (start 0); trailing blank
    # segment (3..5) absorbed to int(mid)=4
    assert spans[0][2:6] == (0, 4, 0, 80)
    # last span: leading blank to int((3+5)/2)=4, trailing absorbed fully
    assert spans[1][2:6] == (4, 7, 80, 140)
    assert spans[0][6] == pytest.approx(1.0)  # exp(mean 0)


def test_align_row_error_contract():
    em = np.zeros((2, 3))
    spans, err = align_row(em.tolist(), [1, 1, 2])  # min_T=4 > 2
    assert spans == [] and "cannot align" in err
    spans, err = align_row(em.tolist(), [0])  # blank as target
    assert spans == [] and err
    spans, err = align_row(em.tolist(), [])
    assert spans == [] and err


def test_align_spans_spark(spark):
    rng = np.random.default_rng(3)
    rows = []
    expected = {}
    for rid in range(12):
        T = int(rng.integers(4, 10))
        L = int(rng.integers(1, 4))
        targets = rng.integers(1, 5, size=L).tolist()
        em = rng.normal(size=(T, 5)).round(3)
        rows.append((rid, em.tolist(), targets))
        expected[rid] = align_row(em.tolist(), targets)
    df = spark.createDataFrame(
        rows, "event_id long, emissions array<array<double>>, targets array<int>"
    )
    out = align_spans(df, id_cols=("event_id",)).collect()
    assert len(out) == 12
    for r in out:
        spans, err = expected[r.event_id]
        assert (r.error is None) == (err is None)
        got = [
            (
                s.tok_idx,
                s.token,
                s.start_frame,
                s.end_frame,
                s.start_ms,
                s.end_ms,
            )
            for s in r.spans
        ]
        want = [s[:6] for s in spans]
        assert got == want
        for s_got, s_want in zip(r.spans, spans):
            assert s_got.score == pytest.approx(s_want[6])
