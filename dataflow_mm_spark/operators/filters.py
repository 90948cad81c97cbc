"""Generic filter operators (SURVEY.md §2.3).

* ``score_filter`` — ScoreFilter (score_filter.py:37-84): non-destructive
  ``min ≤ col ≤ max`` range predicate writing a boolean ``select`` column;
* ``range_filter`` — destructive variant (VideoResolutionFilter-style
  between predicates, video_resolution_filter.py:21-28);
* ``nested_clip_filter`` — VideoScoreFilter (video_score_filter.py:222-284):
  per-element range predicates over a nested array of metric structs,
  strict (missing metric fails) vs lenient (missing metric passes), via the
  filter() higher-order function — no explode, no shuffle;
* ``functional_refiner`` — FunctionalRefiner (functional_refiner.py:47-66):
  register an arbitrary Python callable as a vectorized pandas UDF column
  (the reference applies it per row; here it is Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def score_filter(
    df: DataFrame,
    score_col: str = "score",
    min_score: float | None = None,
    max_score: float | None = None,
    select_col: str = "select",
) -> DataFrame:
    cond = F.lit(True)
    if min_score is not None:
        cond = cond & (F.col(score_col) >= min_score)
    if max_score is not None:
        cond = cond & (F.col(score_col) <= max_score)
    return df.withColumn(select_col, cond)


def range_filter(
    df: DataFrame, bounds: dict[str, tuple[float | None, float | None]]
) -> DataFrame:
    """Keep rows where every column is inside its (lo, hi) bounds."""
    out = df
    for col, (lo, hi) in bounds.items():
        if lo is not None:
            out = out.filter(F.col(col) >= lo)
        if hi is not None:
            out = out.filter(F.col(col) <= hi)
    return out


def nested_clip_filter(
    df: DataFrame,
    clips_col: str,
    bounds: dict[str, tuple[float | None, float | None]],
    strict: bool = True,
    out: str = "clips_kept",
) -> DataFrame:
    """Filter elements of an array<struct> column by per-field ranges.
    strict: a null metric fails the element; lenient: it passes."""

    def elem_ok(c: Column) -> Column:
        cond = F.lit(True)
        for field, (lo, hi) in bounds.items():
            v = c[field]
            present = v.isNotNull()
            in_range = F.lit(True)
            if lo is not None:
                in_range = in_range & (v >= lo)
            if hi is not None:
                in_range = in_range & (v <= hi)
            ok = present & in_range if strict else (~present | in_range)
            cond = cond & ok
        return cond

    return df.withColumn(out, F.filter(F.col(clips_col), elem_ok))


def span_score_filter(
    df: DataFrame,
    spans_col: str = "alignment",
    mode: str = "min",
    threshold: float = 0.8,
    drop_empty: bool = True,
) -> DataFrame:
    """CTCForcedAlignmentFilter semantics (audio_ctc...filter.py:191-228):
    aggregate per-span scores by min or mean over a nested
    array<struct<...,score>> and keep rows ≥ threshold; rows with no spans
    (alignment errors) are dropped. Pure aggregate() HOF — no explode."""
    spans = F.col(spans_col)
    if mode == "min":
        agg = F.aggregate(
            spans,
            F.lit(float("inf")),
            lambda acc, s: F.least(acc, s["score"]),
        )
    elif mode == "mean":
        agg = F.aggregate(
            spans, F.lit(0.0), lambda acc, s: acc + s["score"]
        ) / F.size(spans)
    else:
        raise ValueError(f"mode must be min|mean, got {mode}")
    out = df.withColumn("_span_score", agg)
    if drop_empty:
        out = out.filter(F.size(spans) > 0)
    return out.filter(F.col("_span_score") >= threshold).drop("_span_score")


def functional_refiner(
    fn: Callable, return_type: T.DataType | None = None
) -> Callable[..., Column]:
    """Wrap a plain Python scalar function as an Arrow-vectorized column
    transform: ``refined = functional_refiner(my_fn)(col('a'), col('b'))``."""
    rt = return_type or T.StringType()

    @pandas_udf(rt)
    def udf(*cols: pd.Series) -> pd.Series:
        return pd.Series([fn(*vals) for vals in zip(*cols)])

    return udf
