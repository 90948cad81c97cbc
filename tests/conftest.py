from __future__ import annotations

import os

import pytest

# tests assert semantics, not performance: skip the session factory's
# one-time codegen/parquet/Python-worker warmup in every session the suite
# (or its spark-submit subprocesses) creates
os.environ.setdefault("SPARK_GRAFT_WARM", "0")

from dataflow_mm_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.streaming.checkpointLocation.deleteOnStop": "true"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    from dataflow_mm_spark.datagen import transcripts

    df = transcripts(spark, n_convs=60, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_pdf(tiny_transcripts):
    return (
        tiny_transcripts.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
