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
