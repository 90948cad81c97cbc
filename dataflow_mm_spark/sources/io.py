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


# hf:/ms: remote dataset URIs (reference storage.py:175-201: first_entry
# paths like ``hf:dataset:config:split`` download from the HuggingFace /
# ModelScope hub). A Spark cluster reads from a warehouse, not per-driver hub
# caches — so the mapping here is a registry of MOUNTED EXPORTS: either
# registered explicitly (register_dataset_export) or resolved under
# $DATAFLOW_MM_SPARK_DATASET_ROOT/<scheme>/<name>/<config>/<split>. The
# export format is whatever read_any can read (parquet preferred).
_DATASET_EXPORTS: dict[str, str] = {}


def register_dataset_export(uri: str, path: str) -> None:
    """Map a ``hf:...``/``ms:...`` dataset URI to a local/DFS export path."""
    _DATASET_EXPORTS[uri] = path


def _resolve_dataset_uri(path: str) -> str:
    if path in _DATASET_EXPORTS:
        return _DATASET_EXPORTS[path]
    scheme, rest = path.split(":", 1)
    root = os.environ.get("DATAFLOW_MM_SPARK_DATASET_ROOT")
    if root:
        cand = os.path.join(root, scheme, *[p for p in rest.split(":") if p])
        if os.path.exists(cand):
            return cand
    raise ValueError(
        f"dataset URI {path!r} has no registered export: call "
        f"register_dataset_export({path!r}, <path>) or set "
        f"$DATAFLOW_MM_SPARK_DATASET_ROOT (hub downloads are a driver-side "
        f"pattern, not a cluster scan — export to parquet once instead)"
    )


def read_any(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataFrame:
    if path.startswith(("hf:", "ms:")):
        path = _resolve_dataset_uri(path)
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


def warehouse_rows(
    df: DataFrame,
    pipeline_id: str,
    task_id: str,
    raw_data_id_col: str | None = None,
    num_hashes: int = 16,
    array_format: str = "native",
) -> DataFrame:
    """Shape a DataFrame into the reference warehouse row schema
    ``(pipeline_id, task_id, raw_data_id, min_hashes, data)``
    (MyScaleDBStorage.write, reference dataflow/utils/storage.py:389-432):
    ``data`` = the whole row as a JSON string, ``raw_data_id`` = the given
    column (the reference reads ``sys:raw_data_id`` from the payload,
    defaulting 0), ``min_hashes`` = a real MinHash signature of the payload
    (the reference stubs this to ``[0]`` — storage.py:290-291) so warehouse-
    side near-dup lookups work. ``min_hashes`` is ``array<bigint>`` — the
    reference inserts integer arrays, so a real ClickHouse/MyScale
    ``Array(UInt32/Int64)`` column accepts these rows (ADVICE r3: hex-string
    arrays would fail the INSERT against a numeric-array column). Each
    element is the repo's portable 60-bit form of the per-family min digest:
    ``conv(substr(md5,1,15),16,10)::bigint`` — always positive, fits int64.
    Pure transform — unit-testable without a warehouse; ``jdbc_write`` is
    the thin writer on top."""
    from pyspark.sql import functions as F

    from dataflow_mm_spark.functions.dedup import minhash_signature

    data = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    raw_id = (
        F.col(raw_data_id_col).cast("long")
        if raw_data_id_col
        else F.lit(0).cast("long")
    )
    sig_hex = minhash_signature(data, num_hashes=num_hashes)
    sig_int = F.transform(
        sig_hex,
        lambda h: F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
    )
    if array_format == "json":
        # for warehouses whose Spark JDBC dialect has no ARRAY mapping
        # (Derby/H2/...): the signature rides as a JSON int-array string
        sig_int = F.to_json(sig_int)
    return df.select(
        F.lit(pipeline_id).alias("pipeline_id"),
        F.lit(task_id).alias("task_id"),
        raw_id.alias("raw_data_id"),
        sig_int.alias("min_hashes"),
        data.alias("data"),
    )


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    pipeline_id: str,
    task_id: str,
    mode: str = "append",
    raw_data_id_col: str | None = None,
    batchsize: int = 10_000,
    _format: str = "jdbc",
    array_format: str = "native",
    **options,
) -> None:
    """Warehouse write (MyScaleDBStorage.write analogue): every row lands as
    ``(pipeline_id, task_id, raw_data_id, min_hashes, data)``. Executors
    write their partitions in parallel (``batchsize`` rows per INSERT) —
    no driver-side collect. ``_format`` exists for the fake-JDBC contract
    test (no JDBC driver ships in this sandbox): the test swaps in
    ``parquet`` + a ``path`` option and verifies the exact row shape through
    the same writer path."""
    out = warehouse_rows(
        df, pipeline_id, task_id, raw_data_id_col, array_format=array_format
    )
    w = out.write.format(_format).mode(mode)
    if _format == "jdbc":
        w = (
            w.option("url", url)
            .option("dbtable", table)
            .option("batchsize", str(batchsize))
        )
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write-time bucketing — the co-located-join layout for repeated joins
    and aggregations on a hot key. Two tables bucketed identically on the
    join key join WITHOUT a shuffle (Spark reads the bucket layout from the
    catalog and plants no Exchange; asserted in
    test_bucketed_join_is_shuffle_free). At warehouse scale this is the
    difference between re-shuffling 100TB per join and never shuffling it
    again after ingest; ``buckets`` should match the downstream
    shuffle-partition layout (see BENCH.md state-partition pinning)."""
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


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
