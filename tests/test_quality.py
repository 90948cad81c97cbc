"""Parity: Spark 15-rule quality scorer vs pandas oracle (reference
rule_base_filter.py:243-354 semantics)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dataflow_mm_spark.datagen import DEFECTS, TEMPLATES
from dataflow_mm_spark.functions.quality import rule_base_filter, with_quality
from dataflow_mm_spark.oracles.quality_oracle import passes_quality, quality_mask


def test_templates_pass_defects_fail():
    for t in TEMPLATES:
        assert passes_quality(t), t
    for i, d in enumerate(DEFECTS):
        assert not passes_quality(d), (i, d)


def test_spark_matches_oracle_on_corpus(spark):
    corpus = (
        list(TEMPLATES)
        + list(DEFECTS)
        + [
            "",
            "   ",
            "no newline single line text that is fine",
            "ends with ellipsis only line...",
            "UPPER lower MIXED case WORDS here NOW",
            "x" * 30,
            "one { brace in eighty characters of otherwise normal prose padding padding pad",
            'tool span <tool_call>{"name": "search_web", "args": {"q": "item-1"}}</tool_call>',
            "<answer> 42 </answer> short",
            "a.b,c;d e f g h i j k l",
        ]
    )
    pdf = pd.DataFrame({"id": range(len(corpus)), "text": corpus})
    sdf = with_quality(spark.createDataFrame(pdf))
    got = {r.id: r.quality["pass"] for r in sdf.select("id", "quality").collect()}
    want = dict(zip(pdf.id, quality_mask(pdf.text)))
    assert got == want


def test_spark_matches_oracle_on_transcripts(spark, tiny_transcripts, tiny_pdf):
    kept = (
        rule_base_filter(tiny_transcripts)
        .select("conv_id", "turn_idx")
        .collect()
    )
    got = {(r.conv_id, r.turn_idx) for r in kept}
    mask = quality_mask(tiny_pdf.text)
    want = set(
        zip(tiny_pdf.conv_id[mask], tiny_pdf.turn_idx[mask])
    )
    assert got == want
    # sanity: filter actually removes and keeps something
    assert 0 < len(got) < len(tiny_pdf)


def test_custom_thresholds(spark):
    import pandas as pd

    from dataflow_mm_spark.functions.quality import quality_struct

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["SHOUTY text here with several lowercase words now"]})
    )
    default = df.select(quality_struct(F.col("text"))["pass"].alias("p")).first().p
    strict = df.select(
        quality_struct(F.col("text"), capital_words_threshold=0.1)["pass"].alias("p")
    ).first().p
    assert default is True and strict is False

    wm = df.select(
        quality_struct(F.col("text"), watermarks=("SHOUTY",))["pass"].alias("p")
    ).first().p
    assert wm is False


def test_quality_plan_is_codegen(spark, tiny_transcripts):
    """The scorer must stay JVM-side: no Python UDF nodes in the plan."""
    plan = rule_base_filter(tiny_transcripts)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
