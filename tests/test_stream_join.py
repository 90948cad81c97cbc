from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_mm_spark.datagen import transcripts
from dataflow_mm_spark.streaming.joins import prev_turn_context_stream
from dataflow_mm_spark.streaming.sink import ExactlyOnceParquetSink


def test_stream_stream_prev_turn_join_matches_batch(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    df = transcripts(spark, n_convs=40, seed=42)
    df.coalesce(2).write.parquet(inp)

    from dataflow_mm_spark.schema import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(inp)
    joined = prev_turn_context_stream(stream, watermark="10 minutes", max_gap="1 hour")
    sink = ExactlyOnceParquetSink(out)
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.conv_id, r.turn_idx, r.prev_role)
        for r in sink.read_committed(spark).collect()
    }

    cur = df.alias("c")
    prev = df.select(
        F.col("conv_id").alias("pc"),
        F.col("turn_idx").alias("pi"),
        F.col("role").alias("prev_role"),
        F.col("ts").alias("pts"),
    )
    batch = cur.join(
        prev,
        (F.col("c.conv_id") == F.col("pc"))
        & (F.col("c.turn_idx") == F.col("pi") + 1)
        & (F.col("c.ts") >= F.col("pts"))
        & (F.col("c.ts") <= F.col("pts") + F.expr("INTERVAL 1 hour")),
    )
    want = {
        (r.conv_id, r.turn_idx, r.prev_role)
        for r in batch.select("c.conv_id", "c.turn_idx", "prev_role").collect()
    }
    assert got == want and len(got) > 100
