"""Streaming sources for transcript tables.

Production shape: ``spark.readStream.format('iceberg')`` over a table
partitioned by ``days(ts), bucket(conv_id, N)``. The sandbox has no Iceberg
jar, so the file source reads a parquet directory with the same schema and
micro-batches via ``maxFilesPerTrigger`` — the query code is identical either
way (reference input behavior: whole-file eager read, storage.py:153-209;
here files become an unbounded stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataflow_mm_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    r = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path).withWatermark("ts", watermark)
