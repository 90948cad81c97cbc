"""Answer-reward evaluation — GeneralTextAnswerEvaluator re-expressed.

Reference: dataflow/operators/core_vision/eval/general_text_answer_evaluator.py
(calculate_reward :103-148, wer :63-81, rouge :95-100). Per question type:

* ``multiple choice``: exact match of extracted answers — pure Spark;
* ``numerical``: decimal-presence agreement + comma-stripped float equality
  rounded to 2dp — pure Spark;
* ``regression``: 1 - clipped relative difference — pure Spark;
* ``OCR``: 1 - word-level WER (edit distance / ref length) — Arrow pandas UDF
  (word-level DP has no JVM builtin; char-level ``levenshtein`` is not the
  reference metric);
* ``free-form``: mean of ROUGE-1/2/L F-measures — Arrow pandas UDF
  (implemented from the published ROUGE definition; tokenizer = lowercased
  ``[a-z0-9]+`` runs, matching google-research rouge_score defaults without
  stemming).

``with_reward(df, ...)`` appends a ``reward`` double column; corpus mean =
``df.agg(F.avg('reward'))`` (partial/final aggregation, map-side combine).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dataflow_mm_spark.functions.extraction import extract_answer

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _wer(ref: str, hyp: str) -> float:
    r, h = ref.split(), hyp.split()
    m, n = len(r), len(h)
    if m == 0:
        return float(n)
    prev = np.arange(n + 1)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (r[i - 1] != h[j - 1]),
            )
        prev = cur
    return prev[n] / max(1, m)


def _f1(overlap: int, n_ref: int, n_hyp: int) -> float:
    if overlap == 0:
        return 0.0
    p, r = overlap / n_hyp, overlap / n_ref
    return 2 * p * r / (p + r)


def _ngram_f1(ref: list[str], hyp: list[str], n: int) -> float:
    if len(ref) < n or len(hyp) < n:
        return 0.0
    from collections import Counter

    rg = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
    hg = Counter(tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1))
    overlap = sum(min(rg[g], hg[g]) for g in rg.keys() & hg.keys())
    return _f1(overlap, sum(rg.values()), sum(hg.values()))


def _lcs_f1(ref: list[str], hyp: list[str]) -> float:
    if not ref or not hyp:
        return 0.0
    m, n = len(ref), len(hyp)
    dp = np.zeros((m + 1, n + 1), dtype=np.int64)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if ref[i - 1] == hyp[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return _f1(int(dp[m][n]), m, n)


def bleu(ref: str, hyp: str, max_n: int = 4) -> float:
    """Sentence BLEU with add-epsilon smoothing on zero n-gram counts
    (reference compute_bleu_score uses nltk SmoothingFunction().method1,
    general_text_answer_evaluator.py:83-93; formula from Papineni et al.
    2002 / Chen & Cherry 2014 method1)."""
    import math
    from collections import Counter

    rt, ht = ref.split(), hyp.split()
    if not ht:
        return 0.0
    log_p = 0.0
    for n in range(1, max_n + 1):
        hg = Counter(tuple(ht[i : i + n]) for i in range(len(ht) - n + 1))
        rg = Counter(tuple(rt[i : i + n]) for i in range(len(rt) - n + 1))
        total = sum(hg.values())
        if total == 0:
            return 0.0
        overlap = sum(min(c, rg[g]) for g, c in hg.items())
        # method1: add 0.1 to zero numerators
        p = (overlap if overlap > 0 else 0.1) / total
        log_p += math.log(p)
    bp = 1.0 if len(ht) > len(rt) else math.exp(1 - len(rt) / max(1, len(ht)))
    return bp * math.exp(log_p / max_n)


@pandas_udf(T.DoubleType())
def bleu_udf(ref: pd.Series, hyp: pd.Series) -> pd.Series:
    """Column form of :func:`bleu` (Arrow-batched)."""
    return pd.Series(
        [bleu(r or "", h or "") for r, h in zip(ref, hyp)], dtype="float64"
    )


def rouge_mean(ref: str, hyp: str) -> float:
    rt = _TOKEN_RE.findall(ref.lower())
    ht = _TOKEN_RE.findall(hyp.lower())
    return (_ngram_f1(rt, ht, 1) + _ngram_f1(rt, ht, 2) + _lcs_f1(rt, ht)) / 3


@pandas_udf(T.DoubleType())
def _text_reward_udf(
    gt: pd.Series, out: pd.Series, qtype: pd.Series
) -> pd.Series:
    def score(g, o, q):
        g = g or ""
        o = o or ""
        if q == "OCR":
            return max(0.0, min(1.0, 1.0 - _wer(g, o)))
        if q == "free-form":
            return max(0.0, min(1.0, rouge_mean(g, o)))
        return 0.0

    return pd.Series(
        [score(g, o, q) for g, o, q in zip(gt, out, qtype)], dtype="float64"
    )


def _normalize_number(s: Column) -> Column:
    # try_cast: malformed numbers -> null (reference normalize_number
    # returns None on ValueError); plain cast throws under ANSI mode.
    return F.replace(s, F.lit(","), F.lit("")).try_cast("double")


def reward(gt_solution: Column, model_output: Column, question_type: Column) -> Column:
    """Reward column per reference calculate_reward (:103-148)."""
    gt = extract_answer(gt_solution)
    out = extract_answer(model_output)

    exact = F.when(F.trim(out) == F.trim(gt), 1.0).otherwise(0.0)

    gt_dec = gt.contains(".") | gt.contains(",")
    out_dec = out.contains(".") | out.contains(",")
    gt_num = _normalize_number(gt)
    out_num = _normalize_number(out)
    numerical = (
        F.when(gt_dec != out_dec, 0.0)
        .when(gt_num.isNull() | out_num.isNull(), 0.0)
        .when(F.round(gt_num, 2) == F.round(out_num, 2), 1.0)
        .otherwise(0.0)
    )

    rel_diff = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            (F.abs(out_num - gt_num) + 1e-9) / (F.abs(gt_num) + 1e-9),
        ),
    )
    regression = (
        F.when(gt_num.isNull() | out_num.isNull(), 0.0).otherwise(1.0 - rel_diff)
    )

    textual = _text_reward_udf(gt, out, question_type)

    return (
        F.when(question_type == "multiple choice", exact)
        .when(question_type == "numerical", numerical)
        .when(question_type == "regression", regression)
        .when(question_type.isin("OCR", "free-form"), textual)
        .otherwise(0.0)
    )


def with_reward(
    df: DataFrame,
    gt_col: str = "gt_solution",
    output_col: str = "model_output",
    qtype_col: str = "question_type",
    out: str = "reward",
) -> DataFrame:
    return df.withColumn(out, reward(F.col(gt_col), F.col(output_col), F.col(qtype_col)))
