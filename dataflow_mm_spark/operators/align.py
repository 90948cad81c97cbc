"""CTC forced alignment — the algorithmic core of the reference's
``CTCForcedAlignmentSampleEvaluator`` re-expressed without torch.

The reference (audio_ctc_forced_alignment_transcription_quality_evaluator
.py:355-474) delegates the trellis to ``torchaudio.functional.forced_align``
and then post-processes with ``merge_repeats`` (:461) and ``get_spans``
(:478).  Here the same Viterbi DP over the blank-interleaved CTC state
lattice (Graves et al. 2006, the public CTC formulation torchaudio
implements) runs in numpy/python inside an Arrow-batched ``mapInPandas``,
and the segment/span post-passes mirror the reference's frame bookkeeping
exactly (end-inclusive segments, blank-midpoint padding).

Scope split per the north rule: the *acoustic model* that produces
emissions (an MMS CTC head in the reference) is a serving concern and
stays pluggable — emissions arrive as a column ``array<array<double>>``
(T x V frame log-probs) from any upstream serving UDF or test fixture.
Everything downstream of the model — the part torchaudio/ctc-forced-aligner
did for the reference — is REAL here.

Lattice recap: for targets y_1..y_L the extended state sequence is
``blank, y_1, blank, y_2, ..., y_L, blank`` (S = 2L+1 states).  A valid
path is monotone over states with steps {0,+1,+2}, where +2 is allowed
only onto a token state whose token differs from the token two states
back; it must start in state 0 or 1 and end in state S-1 or S-2.  The DP
maximizes the summed frame log-probs; per-frame tie-break prefers the
smaller step (stay < +1 < +2), matching a deterministic left-most path.

Sizing: the per-frame inner update is O(S).  Below ``_VEC_MIN_STATES``
states the update runs as a plain python loop — at tiny S the numpy
dispatch constant costs more than the arithmetic (CLAUDE.md
vectorize-with-numpy rule, measured on the neardup scan A/B) — and
switches to vectorized numpy shifts above it (real ASR utterances:
S in the hundreds, T in the thousands).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_NEG_INF = -math.inf
_VEC_MIN_STATES = 32

SPAN_SCHEMA = (
    "array<struct<tok_idx:int,token:int,start_frame:int,end_frame:int,"
    "start_ms:bigint,end_ms:bigint,score:double>>"
)


def ctc_forced_align(
    emissions: np.ndarray, targets: list[int] | np.ndarray, blank: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Viterbi forced alignment: return (path, frame_scores) where
    ``path[t]`` is the emitted symbol (token id or blank) at frame t and
    ``frame_scores[t]`` its log-prob — the same contract as
    ``torchaudio.functional.forced_align`` squeezed to one sequence
    (reference :434-441).  Raises ValueError when the targets cannot fit
    in T frames (the reference surfaces this as the per-row error field).
    """
    em = np.asarray(emissions, dtype=np.float64)
    y = [int(t) for t in targets]
    T, V = em.shape
    L = len(y)
    if L == 0:
        raise ValueError("empty targets")
    if any(t == blank or not (0 <= t < V) for t in y):
        raise ValueError("target out of vocabulary or equal to blank")
    S = 2 * L + 1
    ext = [blank] * S
    for i, t in enumerate(y):
        ext[2 * i + 1] = t
    # minimum frames: every token needs one frame, plus a blank between
    # equal consecutive tokens (the +2 skip is blocked there)
    min_T = L + sum(1 for i in range(1, L) if y[i] == y[i - 1])
    if T < min_T:
        raise ValueError(f"T={T} frames cannot align L={L} targets (min {min_T})")

    ext_arr = np.asarray(ext)
    can_skip = np.zeros(S, dtype=bool)  # +2 transition allowed INTO state s
    for s in range(2, S):
        can_skip[s] = (s % 2 == 1) and ext[s] != ext[s - 2]

    alpha = np.full(S, _NEG_INF)
    alpha[0] = em[0, blank]
    if S > 1:
        alpha[1] = em[0, ext[1]]
    bp = np.zeros((T, S), dtype=np.int8)  # step taken INTO (t, s): 0/1/2

    if S >= _VEC_MIN_STATES:
        emt_idx = ext_arr
        for t in range(1, T):
            stay = alpha
            step1 = np.concatenate(([_NEG_INF], alpha[:-1]))
            step2 = np.concatenate(([_NEG_INF, _NEG_INF], alpha[:-2]))
            step2 = np.where(can_skip, step2, _NEG_INF)
            # tie-break: prefer smaller step — strict > for later candidates
            best = stay
            step = np.zeros(S, dtype=np.int8)
            m1 = step1 > best
            best = np.where(m1, step1, best)
            step = np.where(m1, np.int8(1), step)
            m2 = step2 > best
            best = np.where(m2, step2, best)
            step = np.where(m2, np.int8(2), step)
            bp[t] = step
            alpha = best + em[t, emt_idx]
    else:
        a = alpha.tolist()
        for t in range(1, T):
            emt = em[t]
            nxt = [_NEG_INF] * S
            bpt = bp[t]
            for s in range(S):
                best = a[s]
                step = 0
                if s >= 1 and a[s - 1] > best:
                    best = a[s - 1]
                    step = 1
                if s >= 2 and can_skip[s] and a[s - 2] > best:
                    best = a[s - 2]
                    step = 2
                if best != _NEG_INF:
                    bpt[s] = step
                    nxt[s] = best + emt[ext[s]]
            a = nxt
        alpha = np.asarray(a)

    s = S - 1 if alpha[S - 1] >= alpha[S - 2] else S - 2
    if alpha[s] == _NEG_INF:
        raise ValueError("no feasible alignment path")
    states = np.empty(T, dtype=np.int64)
    for t in range(T - 1, -1, -1):
        states[t] = s
        s -= int(bp[t, s])
    path = ext_arr[states]
    scores = em[np.arange(T), path]
    return path, scores


def merge_repeats(
    path: np.ndarray, scores: np.ndarray
) -> list[tuple[int, int, int, float]]:
    """Collapse the per-frame path into end-INCLUSIVE segments
    ``(symbol, start, end, sum_logprob)`` — reference merge_repeats
    (:461-469, ``Segment(label, i1, i2 - 1)``)."""
    segs: list[tuple[int, int, int, float]] = []
    i1 = 0
    n = len(path)
    while i1 < n:
        i2 = i1
        while i2 < n and path[i1] == path[i2]:
            i2 += 1
        segs.append((int(path[i1]), i1, i2 - 1, float(scores[i1:i2].sum())))
        i1 = i2
    return segs


def token_spans(
    targets: list[int] | np.ndarray,
    segments: list[tuple[int, int, int, float]],
    blank: int = 0,
    stride_ms: int = 20,
) -> list[tuple[int, int, int, int, int, int, float]]:
    """Map each target token to its padded frame span — the reference's
    ``get_spans`` (:478-524) specialized to token targets (each target
    owns exactly one non-blank segment, in order: the lattice is monotone
    and never revisits a token state).  Padding rule mirrored exactly:
    a span absorbs the adjacent blank segment up to its midpoint
    (``int((start+end)/2)``), or fully at the sequence edges (first span's
    leading blank start / last span's trailing blank end).  Score is
    ``exp(mean frame log-prob over the token's own frames)`` — the
    reference's per-word ``math.exp(score)`` (:395-397) with mean-frame
    normalization so span length doesn't change the scale.

    Returns ``(tok_idx, token, start_frame, end_frame, start_ms, end_ms,
    score)`` with end-inclusive frames and ms = frame * stride_ms (the
    reference's 20ms MMS stride, time_to_frame :472-475).
    """
    y = [int(t) for t in targets]
    tok_segs = [i for i, seg in enumerate(segments) if seg[0] != blank]
    if len(tok_segs) != len(y):
        raise ValueError("segment/target mismatch — not a forced path")
    out = []
    last = len(tok_segs) - 1
    for idx, si in enumerate(tok_segs):
        sym, s0, s1, ssum = segments[si]
        if sym != y[idx]:
            raise ValueError("segment label does not match target")
        start, end = s0, s1
        if si > 0 and segments[si - 1][0] == blank:
            pb = segments[si - 1]
            start = pb[1] if idx == 0 else int((pb[1] + pb[2]) / 2)
        if si + 1 < len(segments) and segments[si + 1][0] == blank:
            nb = segments[si + 1]
            end = nb[2] if idx == last else math.floor((nb[1] + nb[2]) / 2)
        n_frames = s1 - s0 + 1
        score = math.exp(ssum / n_frames)
        out.append(
            (idx, sym, start, end, start * stride_ms, end * stride_ms, score)
        )
    return out


def align_row(
    emissions, targets, blank: int = 0, stride_ms: int = 20
) -> tuple[list[tuple], str | None]:
    """One row end-to-end: DP → merge → spans; errors are caught and
    returned as the per-row error field (reference :400-407 records
    ``{'alignment': [], 'error': str(e)}`` instead of failing the job)."""
    try:
        em = np.asarray([np.asarray(f, dtype=np.float64) for f in emissions])
        if em.ndim != 2:
            raise ValueError("emissions must be T x V")
        path, scores = ctc_forced_align(em, targets, blank=blank)
        segs = merge_repeats(path, scores)
        return token_spans(targets, segs, blank=blank, stride_ms=stride_ms), None
    except (ValueError, TypeError) as e:  # noqa: PERF203 — per-row contract
        return [], str(e)


def align_spans(
    df: DataFrame,
    emissions_col: str = "emissions",
    targets_col: str = "targets",
    id_cols: tuple[str, ...] = ("event_id",),
    blank: int = 0,
    stride_ms: int = 20,
) -> DataFrame:
    """Spark surface: Arrow-batched forced alignment.  Input columns:
    ``emissions array<array<double>>`` (T x V frame log-probs from the
    pluggable acoustic-serving stage), ``targets array<int>``.  Output:
    id columns + ``spans`` (tok_idx, token, padded start/end frame,
    start/end ms, exp-mean-logprob score) + ``error string`` (NULL on
    success).  Rows are independent → plain ``mapInPandas``; emissions are
    the payload so they necessarily cross the Arrow boundary once, and
    nothing else wide should be carried alongside (project first)."""
    ids_schema = ", ".join(
        f"{c} {t}"
        for c, t in (
            (c, dict(df.dtypes)[c]) for c in id_cols
        )
    )
    schema = f"{ids_schema}, spans {SPAN_SCHEMA}, error string"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            spans_out, err_out = [], []
            for em, tg in zip(pdf[emissions_col], pdf[targets_col]):
                spans, err = align_row(em, tg, blank=blank, stride_ms=stride_ms)
                spans_out.append(
                    [
                        {
                            "tok_idx": s[0],
                            "token": s[1],
                            "start_frame": s[2],
                            "end_frame": s[3],
                            "start_ms": s[4],
                            "end_ms": s[5],
                            "score": s[6],
                        }
                        for s in spans
                    ]
                )
                err_out.append(err)
            out = pdf[list(id_cols)].copy()
            out["spans"] = spans_out
            out["error"] = err_out
            yield out

    return df.mapInPandas(gen, schema)
