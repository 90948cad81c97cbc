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


def _be_int(b, pos: int, n: int):
    """Big-endian unsigned int from ``n`` bytes at 1-based ``pos`` — pure
    Catalyst (hex → base-16 conv), no Python."""
    return F.conv(F.hex(F.substring(b, pos, n)), 16, 10).cast("int")


def _le_int16(b, pos: int):
    """Little-endian uint16 at 1-based ``pos``."""
    return (
        F.conv(F.hex(F.substring(b, pos, 1)), 16, 10)
        + F.conv(F.hex(F.substring(b, pos + 1, 1)), 16, 10) * 256
    ).cast("int")


def _le_int32(b, pos: int):
    """Little-endian uint32 at 1-based ``pos`` (BMP dims are int32 but
    real-world widths fit int)."""
    out = F.lit(0).cast("bigint")
    for i in range(4):
        out = out + F.conv(F.hex(F.substring(b, pos + i, 1)), 16, 10) * (256 ** i)
    return out.cast("int")


def with_asset_meta(df: DataFrame, bin_col: str = "payload", out: str = "meta") -> DataFrame:
    """Cheap metadata from the binary itself — JVM-only, no decode: magic
    sniff, sha256, and REAL pixel dimensions parsed from the fixed-offset
    headers of PNG (IHDR, big-endian at byte 17/21), GIF (logical screen,
    little-endian at 7/9) and BMP (BITMAPINFOHEADER at 19/23). JPEG dims
    live in a variable-offset SOF marker — left NULL here (that scan is the
    decode kernel's job). This makes resolution-range filters
    (video_info_filter.py:324-336 analogue) real for PNG/GIF/BMP without
    any codec."""
    b = F.col(bin_col)
    is_jpg = F.substring(b, 1, 3) == bytes([0xFF, 0xD8, 0xFF])
    is_png = F.substring(b, 1, 4) == b"\x89PNG"
    is_gif = F.substring(b, 1, 4) == b"GIF8"
    is_bmp = F.substring(b, 1, 2) == b"BM"
    mime = (
        F.when(is_jpg, "image/jpeg")
        .when(is_png, "image/png")
        .when(is_gif, "image/gif")
        .when(is_bmp, "image/bmp")
        .when(F.substring(b, 1, 4) == b"RIFF", "audio/wav")
        .otherwise("application/octet-stream")
    )
    long_enough = F.length(b) >= 26
    width = (
        F.when(is_png & long_enough, _be_int(b, 17, 4))
        .when(is_gif & long_enough, _le_int16(b, 7))
        .when(is_bmp & long_enough, _le_int32(b, 19))
        .otherwise(F.lit(None).cast("int"))
    )
    height = (
        F.when(is_png & long_enough, _be_int(b, 21, 4))
        .when(is_gif & long_enough, _le_int16(b, 9))
        .when(is_bmp & long_enough, _le_int32(b, 23))
        .otherwise(F.lit(None).cast("int"))
    )
    return df.withColumn(
        out,
        F.struct(
            mime.alias("mime"),
            width.alias("width"),
            height.alias("height"),
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
