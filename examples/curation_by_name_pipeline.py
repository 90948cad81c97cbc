"""Name-resolved curation pipeline — the second migration example.

A reference user's pipeline often wires operators by their registry NAME
(dataflow/utils/registry.py get_operator). This example runs an embedding +
text curation pass resolving every stage through the shim
(`dataflow_mm_spark.registry.get_operator`), exercising the round-2 surface:
Whisper-EN normalization, quality filter, exact dedup, KNN-uniqueness
filter, and DataTailor-style selection.

Run:  python examples/curation_by_name_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataflow_mm_spark.functions.similarity import energy_entropy, knn_avg_sim  # noqa: E402
from dataflow_mm_spark.registry import get_operator  # noqa: E402
from dataflow_mm_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("curation-by-name", master="local[8]", shuffle_partitions=16)

    # --- text curation: normalize → quality filter → dedup -----------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    whisper = get_operator("WhisperTextNormalizer")     # Column -> Column
    quality = get_operator("RuleBaseFilter")            # DataFrame -> DataFrame
    dedup = get_operator("ImageDeduplicateFilter")      # (minhash-LSH keep-first)

    normalized = docs.withColumn("text", whisper(F.col("text")))
    curated = dedup(quality(normalized), n=2, threshold=0.8)
    n_in, n_out = docs.count(), curated.count()
    print(f"text curation: {n_in} -> {n_out} docs "
          f"(quality+near-dup keep-first, whisper-normalized)")

    # --- embedding curation: uniqueness + informativeness → DataTailor -----
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    select = get_operator("DataTailorFilter")
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v")
    )
    inf = base.select(
        "vec_id", F.round(energy_entropy(F.col("_v")), 6).alias("informativeness")
    )
    scored = (
        inf.join(knn_avg_sim(emb, k=5), "vec_id")
        .withColumn("uniqueness", F.round(1 - F.col("knn_sim"), 6))
    )
    picked = select(
        scored, k=50, informativeness_col="informativeness",
        uniqueness_col="uniqueness", id_col="vec_id",
    )
    print(f"embedding curation: {emb.count()} -> {picked.count()} vectors "
          f"(1/3 informativeness + 2/3 uniqueness, rank-normalized top-k)")
    spark.stop()


if __name__ == "__main__":
    main()
