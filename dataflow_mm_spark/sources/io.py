"""Batch sources / sinks — the FileStorage surface re-expressed.

Reference: dataflow/utils/storage.py — json/jsonl/csv/parquet/pickle step
files (:106-143, :228-239), hf:/ms: remote URIs (:175-201), ClickHouse paging
(:353-432), step-counter lineage (:88-104).

Spark-first mapping: formats become ``spark.read.<fmt>`` (pickle is
deliberately unsupported — not a columnar interchange format; parquet is the
default interchange). The step-file materialization between operators
disappears entirely — operators compose lazily — but ``StepStorage`` keeps
the same read→transform→write rhythm for users migrating reference
pipelines, writing parquet snapshots with a step counter (useful for
debugging lineage, not required for execution). Warehouse paging becomes a
predicate-pushdown JDBC read (``jdbc_read``), LIMIT/OFFSET loops replaced by
partitioned parallel scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_any(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataFrame:
    fmt = fmt or _infer_fmt(path)
    r = spark.read
    if fmt == "parquet":
        return r.options(**options).parquet(path)
    if fmt in ("json", "jsonl"):
        return r.options(**options).json(path)
    if fmt == "csv":
        return r.options(header="true", inferSchema="true", **options).csv(path)
    raise ValueError(f"unsupported format: {fmt} (pickle is intentionally unsupported)")


def write_any(df: DataFrame, path: str, fmt: str | None = None, mode: str = "overwrite", **options) -> str:
    fmt = fmt or _infer_fmt(path)
    w = df.write.mode(mode).options(**options)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt in ("json", "jsonl"):
        w.json(path)
    elif fmt == "csv":
        w.option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    return path


def _infer_fmt(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lstrip(".").lower()
    return ext or "parquet"


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
) -> DataFrame:
    """Warehouse scan (MyScaleDBStorage analogue): partitioned parallel read
    with predicate pushdown instead of LIMIT/OFFSET pages."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


class StepStorage:
    """FileStorage-compatible step rhythm for migrating pipelines:
    ``read() → transform → write(df)`` with a step counter; every step is a
    parquet snapshot under ``<root>/<prefix>_step<N>``."""

    def __init__(self, spark: SparkSession, first_entry_path: str, cache_root: str,
                 prefix: str = "step"):
        self.spark = spark
        self.entry = first_entry_path
        self.root = cache_root
        self.prefix = prefix
        self.step_count = 0

    def _path(self, n: int) -> str:
        return os.path.join(self.root, f"{self.prefix}_step{n}")

    def step(self) -> "StepStorage":
        self.step_count += 1
        return self

    def reset(self) -> None:
        self.step_count = 0

    def read(self) -> DataFrame:
        if self.step_count == 0:
            return read_any(self.spark, self.entry)
        return self.spark.read.parquet(self._path(self.step_count - 1))

    def write(self, df: DataFrame) -> str:
        path = self._path(self.step_count)
        df.write.mode("overwrite").parquet(path)
        return path
