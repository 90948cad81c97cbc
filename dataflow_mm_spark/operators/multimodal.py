"""Multimodal asset columns — binary payloads + typed metadata.

The reference loads images/audio/video lazily per row from paths
(utils/utils.py:27-50) and probes metadata with cv2/PIL
(video_info_filter.py:324-336). This engine treats assets as opaque
``binary`` columns with explicit metadata structs; the heavy decode /
feature-extract / resize / frame-sample kernels run as Arrow-batched
``mapInPandas`` so the Spark-side plumbing (schema, partition sizing, batch
shape) is real and tested — while the actual codec call is STUBBED in this
container (no cv2/PIL): ``decode_image_stub`` raises NotImplementedError
unless ``fake=True``, which produces a deterministic fake decode so the
pipeline shape can be exercised end-to-end.

Partitioning note: asset rows are large — callers should repartition so a
partition holds ~64-256MB of payload (spark.sql.files.maxPartitionBytes
handles the scan side; after joins use repartition(n)).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def with_asset_meta(df: DataFrame, bin_col: str = "payload", out: str = "meta") -> DataFrame:
    """Cheap metadata from the binary itself (magic sniff + hash) — JVM/
    Arrow only, no decode."""
    b = F.col(bin_col)
    mime = (
        F.when(F.substring(b, 1, 3) == bytes([0xFF, 0xD8, 0xFF]), "image/jpeg")
        .when(F.substring(b, 1, 4) == b"\x89PNG", "image/png")
        .when(F.substring(b, 1, 4) == b"RIFF", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumn(
        out,
        F.struct(
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(b).cast("long").alias("n_bytes"),
            F.sha2(b, 256).alias("sha256"),
        ),
    )


def decode_and_featurize(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
    resize_to: tuple[int, int] = (224, 224),
    fake: bool = False,
) -> DataFrame:
    """Decode → resize → feature-extract, Arrow-batched. Real decode is
    stubbed in this container (no image libs); ``fake=True`` derives a
    deterministic 8-dim feature from the payload hash so downstream plumbing
    (schema, batching, joins) is testable."""
    ids = ", ".join(f"{c} long" for c in id_cols)
    schema = f"{ids}, width int, height int, feature array<float>"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decode requires cv2/PIL — not available in this "
                    "container; pass fake=True for the deterministic stub"
                )
            rows = []
            for r in pdf.itertuples():
                payload: bytes = getattr(r, bin_col) or b""
                h = hashlib.sha256(payload).digest()
                feat = [b / 255.0 for b in h[:8]]
                rows.append(
                    [*[getattr(r, c) for c in id_cols], *resize_to, feat]
                )
            yield pd.DataFrame(
                rows, columns=[*id_cols, "width", "height", "feature"]
            )

    return df.mapInPandas(gen, schema)


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_sec",
    fps_col: str = "fps",
    interval_sec: float = 1.0,
) -> DataFrame:
    """Frame-sampling plan (VideoFrameFilter semantics): one row per sampled
    frame index — pure Spark; the actual frame grab is the stubbed decode."""
    n = F.floor(F.col(duration_col) / interval_sec).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n, F.lit(0))),
        lambda i: F.floor(i * F.lit(interval_sec) * F.col(fps_col)).cast("long"),
    )
    return df.select("*", F.explode(frames).alias("frame_idx"))
