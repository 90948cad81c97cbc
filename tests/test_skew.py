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
