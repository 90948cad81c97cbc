"""Text normalization kernels.

Re-expresses the reference's ``normalize`` helper
(dataflow/operators/core_vision/filter/rule_base_filter.py:35-53: strip
punctuation, lowercase, collapse whitespace, NFD) and the audio text
normalizer's punctuation strip
(dataflow/operators/core_audio/refine/audio_text_normalizer.py:13-17).

The ASCII path is pure Spark (translate/lower/regexp_replace —
whole-stage codegen). NFD unicode normalization has no JVM builtin, so the
full-fidelity variant is an Arrow-vectorized pandas UDF.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

PUNCTUATION = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
# audio_text_normalizer.py PUNCS: CJK + latin sentence punctuation
PUNCS_PATTERN = r'[，。！？；：、“”‘’【】《》（）,.!?;:"\'\[\]<>()]'


def normalize_text(text: Column) -> Column:
    """Strip ASCII punctuation, lowercase, strip + collapse whitespace
    (reference ``normalize`` minus NFD — exact for ASCII corpora).
    Strip is regex-anchored: Spark trim() removes only spaces, not \\n/\\t
    (python str.strip() removes all whitespace)."""
    t = F.lower(F.translate(text, PUNCTUATION, ""))
    return F.regexp_replace(
        F.regexp_replace(t, r"^\s+|\s+$", ""), r"\s+", " "
    )


def strip_puncs(text: Column) -> Column:
    """Audio-normalizer punctuation removal (PUNCS regex)."""
    return F.regexp_replace(text, PUNCS_PATTERN, "")


# Whisper-style English text normalization — the deterministic rule subset of
# the reference's audio transcript normalizer (audio_text_normalizer.py:20,
# which wraps an EnglishTextNormalizer: bracket removal, contraction
# expansion, title abbreviations, punctuation strip, whitespace collapse).
# The number-word engine (five hundred → 500) is intentionally out of scope.
# Rules are ORDERED (won't/can't must expand before the generic n't rule) and
# shared verbatim between the Spark chain, the DuckDB oracle, and the pinned
# Python parity oracle.
WHISPER_EN_RULES: list[tuple[str, str]] = [
    (r"\[[^\]]*\]", " "),      # [bracketed] annotations
    (r"\([^)]*\)", " "),       # (parenthesized) annotations
    (r"\bwon't\b", "will not"),
    (r"\bcan't\b", "can not"),
    (r"\blet's\b", "let us"),
    (r"n't\b", " not"),
    (r"'re\b", " are"),
    (r"'s\b", " is"),
    (r"'d\b", " would"),
    (r"'ll\b", " will"),
    (r"'ve\b", " have"),
    (r"'m\b", " am"),
    (r"\bmr\b", "mister"),
    (r"\bmrs\b", "missus"),
    (r"\bdr\b", "doctor"),
    (r"\bst\b", "saint"),
    (r"[^a-z0-9\s]", " "),     # residual punctuation
    (r"\s+", " "),             # collapse whitespace
]


def whisper_en_normalize(text: Column) -> Column:
    """Ordered regexp_replace chain — pure Catalyst, whole-stage codegen."""
    t = F.lower(text)
    for pat, rep in WHISPER_EN_RULES:
        t = F.regexp_replace(t, pat, rep)
    return F.trim(t)


def whisper_en_normalize_py(text: str) -> str:
    """Pinned pure-Python oracle for the hypothesis parity suite."""
    import re

    t = text.lower()
    for pat, rep in WHISPER_EN_RULES:
        t = re.sub(pat, rep, t)
    return t.strip(" ")


def whisper_en_normalize_sql(expr: str) -> str:
    """DuckDB form of the same chain (regexp_replace needs the 'g' flag)."""
    t = f"lower({expr})"
    for pat, rep in WHISPER_EN_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        t = f"regexp_replace({t}, '{p}', '{r}', 'g')"
    return f"trim({t})"


@pandas_udf(T.StringType())
def normalize_text_nfd(texts: pd.Series) -> pd.Series:
    """Full-fidelity normalize incl. NFD (Arrow-batched, vectorized)."""
    table = str.maketrans("", "", PUNCTUATION)

    def norm(t: str | None) -> str | None:
        if t is None:
            return None
        t = t.translate(table).lower().strip()
        t = " ".join(t.split())
        return unicodedata.normalize("NFD", t)

    return texts.map(norm)
