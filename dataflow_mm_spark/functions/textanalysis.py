"""Text analysis kernels for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Spark SQL expressions except the winnowing fingerprint (numpy pandas
UDF). Heuristics are deliberately simple + deterministic so the DuckDB oracle
can replicate them bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "that", "this", "it", "as", "at", "by", "be",
]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """python-split semantics in one regex pass: \\S+ runs of the lowered
    text (trim() strips only spaces — phantom empty tokens otherwise)."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"\S+"), F.lit(0))


def word_count(text: Column) -> Column:
    return F.size(words(text))


def token_count(text: Column) -> Column:
    """BPE-ish token count via regex (letters run / digits run / symbol)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def stopword_ratio(text: Column) -> Column:
    # blank/null guard: ratios must be total (entry_query enriches before any
    # filter; 0/0 under ANSI would throw, and NaN would diverge from DuckDB)
    ws = words(text)
    return F.when(
        F.size(ws) > 0,
        F.size(F.filter(ws, lambda w: w.isin(EN_STOPWORDS))) / F.size(ws),
    ).otherwise(0.0)


def punct_ratio(text: Column) -> Column:
    return F.when(
        F.length(text) > 0,
        (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", "")))
        / F.length(text),
    ).otherwise(0.0)


def lang_guess(text: Column, threshold: float = 0.08) -> Column:
    """n-gram-free heuristic language ID: English iff stopword ratio ≥
    threshold (documents table is synthetic word soup; the heuristic is the
    deterministic contract, not a linguistic claim)."""
    return F.when(stopword_ratio(text) >= threshold, "en").otherwise("other")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band + punctuation sanity +
    stopword presence + lexical diversity, equally weighted."""
    n = F.length(text)
    len_ok = F.when((n >= 64) & (n <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(text) >= 0.02, 1.0).otherwise(0.0)
    ws = words(text)
    diversity = F.when(
        F.size(ws) > 0, F.size(F.array_distinct(ws)) / F.size(ws)
    ).otherwise(0.0)
    div_ok = F.when(diversity >= 0.3, 1.0).otherwise(0.0)
    return F.round((len_ok + punct_ok + stop_ok + div_ok) / 4.0, 6)


def fingerprint_md5(text: Column, prefix_len: int = 16) -> Column:
    """Stable 64-bit-ish document fingerprint: md5 prefix of the normalized
    text. Portable to the DuckDB oracle."""
    from dataflow_mm_spark.functions.normalize import normalize_text

    return F.substring(F.md5(normalize_text(text)), 1, prefix_len)


@pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprints(texts: pd.Series) -> pd.Series:
    """Winnowing document fingerprint (Schleimer et al. 2003): rolling
    polynomial hash over character 5-grams (unicode CODE POINTS — same
    alphabet as DuckDB's unicode(), making the oracle expressible in pure
    SQL), window-4 minima. Vectorized numpy per document."""
    K, W, B, M = 5, 4, 257, (1 << 61) - 1
    # direct polynomial evaluation: max term 0x10FFFF * B^4 ≈ 4.9e15, sum of
    # five ≈ 2.4e16 — inside int64, identical to the mod-M recurrence
    powers = np.array([B ** (K - 1 - j) for j in range(K)], dtype=np.int64)

    def fp(t: str | None) -> list[int]:
        if not t:
            return []
        t = t.lower()  # lower FIRST: the length check must see the same
        if len(t) < K:  # string the oracle's length(lower(text)) sees
            return []
        a = np.array([ord(c) for c in t], dtype=np.int64)
        win = np.lib.stride_tricks.sliding_window_view(a, K)
        h = (win @ powers) % M
        if len(h) <= W:
            return [int(h.min())]
        mins = np.unique(
            np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
        )
        return mins.tolist()

    return texts.map(fp)
