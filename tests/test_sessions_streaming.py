from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataflow_mm_spark.datagen import transcripts
from dataflow_mm_spark.operators.windows import session_agg_batch
from dataflow_mm_spark.streaming import jobs

SENTINEL_TS = dt.datetime(2026, 1, 1)


def test_sessionized_stream_matches_batch_grouping(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    df = transcripts(spark, n_convs=30, seed=42)
    df.coalesce(2).write.parquet(inp)
    s = spark.createDataFrame(
        [("conv-sentinel", 0, "user", "sentinel", None, SENTINEL_TS)],
        schema="conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    s.coalesce(1).write.mode("append").parquet(inp)

    q, sink = jobs.sessionized_pipeline(spark, inp, out, ckpt, gap="30 minutes")
    q.awaitTermination(300)

    got = {
        (r.conv_id, r.sess_start, r.n_turns)
        for r in sink.read_committed(spark)
        .filter(F.col("conv_id") != "conv-sentinel")
        .collect()
    }
    want = {
        (r.conv_id, r.sess_start, r.n_turns)
        for r in session_agg_batch(df, gap_seconds=1800).collect()
    }
    # native session_window uses end = last+gap; grouping (start, count) must agree
    assert got == want and len(got) > 30


def test_session_agg_native_and_batch_hash_identically(spark):
    """One canonical sessionization: the batch gaps-and-islands operator now
    emits sess_end = last + gap (the native session_window end), so the two
    paths agree on ALL shared columns — (conv_id, sess_start, sess_end,
    n_turns) — not just grouping."""
    from dataflow_mm_spark.operators.windows import session_agg

    df = transcripts(spark, n_convs=25, seed=7)
    native = {
        (r.conv_id, r.sess_start, r.sess_end, r.n_turns)
        for r in session_agg(df, gap="30 minutes").collect()
    }
    batch = {
        (r.conv_id, r.sess_start, r.sess_end, r.n_turns)
        for r in session_agg_batch(df, gap_seconds=1800).collect()
    }
    assert native == batch and len(native) > 25


def test_bleu_basics():
    from dataflow_mm_spark.functions.evaluate import bleu

    assert bleu("the cat sat on the mat", "the cat sat on the mat") == 1.0
    assert bleu("the cat sat on the mat", "") == 0.0
    partial = bleu("the cat sat on the mat", "the cat sat on a mat")
    assert 0.0 < partial < 1.0