"""Property-based parity: random adversarial texts through the Spark quality
scorer must match the pandas oracle exactly (hypothesis-generated corpus,
seeded for reproducibility)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataflow_mm_spark.functions.quality import with_quality
from dataflow_mm_spark.oracles.quality_oracle import passes_quality

_alphabet = st.sampled_from(
    list("abcdefg HIJK.!?,;:\n#…•–{}&")
    + ["...", "lorem ipsum", "&nbsp;", "javascript", "id number ", "Copyright"]
)
texts = st.lists(_alphabet, min_size=0, max_size=60).map("".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(texts, min_size=1, max_size=40))
def test_quality_property_parity(spark, corpus):
    pdf = pd.DataFrame({"id": range(len(corpus)), "text": corpus})
    got = {
        r.id: r.q["pass"]
        for r in with_quality(spark.createDataFrame(pdf), out="q")
        .select("id", "q")
        .collect()
    }
    want = {i: passes_quality(t) for i, t in zip(pdf.id, pdf.text)}
    assert got == want
