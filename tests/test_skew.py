from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_mm_spark.operators.skew import salted_agg, with_salt


def test_salted_agg_matches_plain(spark, tiny_transcripts):
    plain = {
        (r.conv_id): (r.n, r.mx)
        for r in tiny_transcripts.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    salted = {
        (r.conv_id): (r.n, r.mx)
        for r in salted_agg(
            tiny_transcripts,
            aggs={"n": "count", "mx": "max:turn_idx"},
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark, tiny_transcripts):
    # the datagen mega-conversation (conv % 200 == 1 → conv-00000001)
    hot = tiny_transcripts.filter(F.col("conv_id") == "conv-00000001")
    assert hot.count() >= 400
    n_salts = (
        with_salt(hot, buckets=16).select("_salt").distinct().count()
    )
    assert n_salts >= 12  # hot key spread over most buckets


def test_salted_avg(spark, tiny_transcripts):
    t = tiny_transcripts.withColumn("x", F.length("text").cast("double"))
    plain = {
        r.conv_id: round(r.a, 9)
        for r in t.groupBy("conv_id").agg(F.avg("x").alias("a")).collect()
    }
    salted = {
        r.conv_id: round(r.a, 9)
        for r in salted_agg(t, aggs={"a": "avg:x"}, buckets=4).collect()
    }
    assert salted == plain


def test_heavy_hitter_detect_then_selective_salt(spark, tiny_transcripts):
    from dataflow_mm_spark.operators.skew import (
        heavy_hitter_keys,
        salted_agg_selective,
    )

    # the datagen mega-conversation dominates tiny_transcripts
    total = tiny_transcripts.count()
    hh = heavy_hitter_keys(
        tiny_transcripts, "conv_id", min_frac=0.05, max_keys=10
    )
    rows = hh.collect()
    assert [r.conv_id for r in rows] and rows[0].conv_id == "conv-00000001"
    for r in rows:
        assert r.n >= 0.05 * total
        assert abs(r.frac - r.n / total) < 1e-12
    # ordered heaviest-first
    assert [r.n for r in rows] == sorted((r.n for r in rows), reverse=True)

    # selective salting: only hot keys fan out in phase 1, and the final
    # aggregate matches a plain groupBy exactly
    agg = salted_agg_selective(
        tiny_transcripts, "conv_id", hh, buckets=8,
        aggs={"n": "count", "mx": "max:turn_idx"},
    )
    plain = {
        r.conv_id: (r.n, r.mx)
        for r in tiny_transcripts.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"))
        .collect()
    }
    assert {r.conv_id: (r.n, r.mx) for r in agg.collect()} == plain
    # the hot-key list joins via broadcast (no shuffle for the hot side)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_heavy_hitters_empty_input(spark):
    from dataflow_mm_spark.operators.skew import heavy_hitter_keys

    empty = spark.createDataFrame([], "conv_id string, turn_idx long")
    assert heavy_hitter_keys(empty, "conv_id").count() == 0
