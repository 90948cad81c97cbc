"""Vision/multimodal asset-curation pipeline — the third migration example.

The reference's vision curation chain (video_info_filter → clip/aesthetic
score filters → image_deduplication → warehouse write) re-expressed
Spark-first over opaque binary asset columns:

1. asset metadata WITHOUT decoding: `with_asset_meta` parses real pixel
   dimensions from PNG/GIF/BMP fixed headers (pure Catalyst byte
   arithmetic) and JPEG SOF / MP4 tkhd via a bounded Arrow walk;
2. resolution range filter (VideoResolutionFilter analogue) on those dims;
3. model-score threshold filter (CLIPScore/aesthetic analogue) through the
   pluggable serving fan-out — a deterministic stand-in here, a real model
   client factory in deployment;
3c. REAL video stage: MJPEG-in-AVI clips through the RIFF container walk
   (dims + header fps), per-frame decode, integer motion score and
   time-based frame sampling — video_info_filter +
   video_motion_score_filter analogues on real numbers;
4. SimHash near-dup keep-first over captions (perceptual-hash dedup
   analogue, 60-bit md5 SimHash + pigeonhole blocking);
5. percentile keep-ratio selection;
6. warehouse write + partitioned read-back through a REAL JDBC driver
   (embedded Derby ships with pyspark) using the reference's
   (pipeline_id, task_id, raw_data_id, min_hashes, data) row shape.

Run:  python examples/vision_asset_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataflow_mm_spark.functions.dedup import simhash_neardup_pairs  # noqa: E402
from dataflow_mm_spark.operators.filters import range_filter  # noqa: E402
from dataflow_mm_spark.operators.generate import prompted_generator  # noqa: E402
from dataflow_mm_spark.functions.mlphead import mlp_score  # noqa: E402
from dataflow_mm_spark.operators.multimodal import (  # noqa: E402
    decode_and_featurize,
    encode_bmp,
    seg_cutout,
    with_asset_meta,
)
from dataflow_mm_spark.operators.topk import keep_top_ratio  # noqa: E402
from dataflow_mm_spark.session import get_spark  # noqa: E402
from dataflow_mm_spark.sources.io import jdbc_read, jdbc_write  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def synth_assets(spark):
    """Documents with a synthesized binary asset column: a valid minimal
    image header (format cycles PNG/GIF/BMP by doc_id) followed by payload
    bytes — enough for every header-metadata operator, no codec needed."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = (F.col("doc_id") % 1600 + 32).cast("bigint")
    h = (F.col("doc_id") % 1000 + 32).cast("bigint")

    def be(v, n):
        return F.lpad(F.hex(v), 2 * n, "0")

    def le(v, n):
        return F.concat(
            *[F.lpad(F.hex(F.floor(v / 256**i) % 256), 2, "0") for i in range(n)]
        )

    png = F.concat(
        F.lit("89504E470D0A1A0A0000000D49484452"), be(w, 4), be(h, 4),
        F.lit("0806000000"),
    )
    gif = F.concat(F.lit("474946383961"), le(w, 2), le(h, 2), F.lit("00" * 16))
    bmp = F.concat(F.lit("424D" + "00" * 12 + "28000000"), le(w, 4), le(h, 4))
    fmt = F.col("doc_id") % 3
    payload = F.unhex(
        F.concat(
            F.when(fmt == 0, png).when(fmt == 1, gif).otherwise(bmp),
            F.substring(F.md5("text"), 1, 16),  # opaque payload tail
        )
    )
    return docs.select(
        "doc_id", F.col("text").alias("caption"), payload.alias("payload")
    )


def fake_score_kernel(prompts: list[str]) -> list[str]:
    """Deterministic stand-in for the CLIP/aesthetic scoring client."""
    return [str(len(p) * 37 % 101) for p in prompts]


def main() -> None:
    spark = get_spark("vision-assets", master="local[8]", shuffle_partitions=16)

    # cache = projection barrier (CLAUDE.md rule): without it the header
    # synthesis expression is re-inlined into every meta/dim reference and
    # the generated method exceeds janino's limit (codegen falls back to
    # interpreted with a WARN + plan dump)
    assets = synth_assets(spark).cache()
    n0 = assets.count()

    # 1-2. header metadata + resolution filter (no decode, no codec)
    meta = with_asset_meta(assets, "payload").select(
        "doc_id", "caption", "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    sized = range_filter(meta, {"width": (64, 1400), "height": (64, None)})
    n1 = sized.count()

    # 3. model-score threshold through the serving fan-out
    prompted = sized.withColumn(
        "_prompt", F.format_string("score %s %s", F.col("mime"), F.col("caption"))
    )
    scored = prompted_generator(
        prompted, lambda: fake_score_kernel, prompt_col="_prompt",
        output_col="_raw", batch_size=64,
    ).withColumn("score", F.col("_raw").try_cast("int") / 100.0).drop(
        "_prompt", "_raw"
    )
    kept = scored.filter(F.col("score") >= 0.25)
    n2 = kept.count()

    # 3b (r5). REAL pixel path for the BMP subset: synthesize full pixel
    # data, then decode → seg-cutout mask application → re-encode → second
    # decode + NN-resize features → aesthetic MLP head (weights supplied
    # like a checkpoint — here a tiny deterministic head over the pixel
    # features; in deployment, CLIP embeddings + the real checkpoint).
    import numpy as np
    import pandas as pd

    def gen_bmp(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                bw, bh = did % 13 + 6, did % 11 + 6
                y, x = np.mgrid[0:bh, 0:bw]
                img = np.stack(
                    [(2 * x + 3 * y + did) % 256, (5 * x + y) % 256,
                     (x + 7 * y) % 256], -1
                ).astype(np.uint8)
                rows.append((did, encode_bmp(img)))
            yield pd.DataFrame(rows, columns=["doc_id", "bmp"])

    pix = (
        kept.filter(F.col("mime") == "image/bmp")
        .select("doc_id")
        .mapInPandas(gen_bmp, "doc_id long, bmp binary")
        .select(
            "doc_id", "bmp",
            (F.col("doc_id") % 3).cast("int").alias("x0"),
            (F.col("doc_id") % 4).cast("int").alias("y0"),
            F.lit(5).cast("int").alias("x1"),
            F.lit(6).cast("int").alias("y1"),
        )
    )
    cut = seg_cutout(pix, "bmp").filter(F.col("error").isNull())
    feats = decode_and_featurize(cut, "cutout", resize_to=(8, 8))
    head = [
        (np.arange(12).reshape(4, 3) % 3 - 1.0, np.zeros(4), "relu"),
        (np.ones((1, 4)), np.array([0.1]), None),
    ]
    aest = mlp_score(feats, "feature", head, out_col="aesthetic")
    n2b = aest.filter(F.col("aesthetic") > -10).count()

    # 3c (r5). REAL video path: MJPEG-in-AVI clips for a subset — RIFF
    # container walk (dims + header fps), per-frame baseline-JPEG decode,
    # integer whole-clip motion score, time-based frame sampling; then the
    # video_info + motion-score filters (video_info_filter /
    # video_motion_score_filter analogues) run on REAL numbers.
    from dataflow_mm_spark.operators.audio import vad_spans
    from dataflow_mm_spark.operators.jpegcodec import encode_jpeg
    from dataflow_mm_spark.operators.video import (
        encode_avi_mjpeg,
        extract_audio,
        sample_frames,
        video_frame_stats,
    )

    def gen_avi(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                y, x = np.mgrid[0:8, 0:16]
                xb, yb = 8 * (x // 8), 8 * (y // 8)
                frames = [
                    encode_jpeg(
                        np.stack(
                            [(2 * xb + 13 * yb + did + 257 * f) % 239,
                             (5 * xb + 11 * yb + did + 257 * f) % 241,
                             (3 * xb + 7 * yb + did + 257 * f) % 251], -1
                        ).astype(np.uint8)
                    )
                    for f in range(did % 3 + 2)
                ]
                pcm = np.zeros(512 * 20, dtype=np.int16)
                pcm[512 * 2 : 512 * (14 + did % 4)] = 21000
                rows.append(
                    (did, encode_avi_mjpeg(
                        frames, width=16, height=8,
                        rate=10000 + (did % 5) * 2000, scale=1000,
                        audio_pcm=pcm.tobytes(), audio_rate=16000,
                    ))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "avi"])

    clips = (
        kept.filter(F.col("doc_id") % 17 == 0)
        .select("doc_id")
        .mapInPandas(gen_avi, "doc_id long, avi binary")
    ).cache()
    vstats = video_frame_stats(clips, bin_col="avi")
    moving = vstats.filter(
        (F.col("motion_millisum") > 0) & F.col("fps_millis").between(10000, 20000)
    )
    n2c = moving.count()
    n2f = sample_frames(clips, every_millis=150, bin_col="avi").count()
    # A/V demux -> the UNCHANGED audio chain: soundtrack out of the
    # container, silero-style VAD spans over it
    tracks = extract_audio(clips, bin_col="avi").filter(
        F.col("error").isNull()
    ).select(F.col("doc_id").alias("event_id"), F.col("wav").alias("payload"))
    n2a = (
        vad_spans(tracks)
        .select(F.explode("spans"))
        .count()
    )

    # 4. caption near-dup keep-first (SimHash, Hamming <= 8)
    pairs = simhash_neardup_pairs(
        kept.select(F.col("doc_id"), F.col("caption").alias("text")),
        max_hamming=8,
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    unique = kept.join(drops, "doc_id", "left_anti")
    n3 = unique.count()

    # 5. keep the top 60% by score
    selected = keep_top_ratio(unique, "score", keep_ratio=0.6, exact=True)
    n4 = selected.count()

    # 6. warehouse round-trip via a real JDBC driver (embedded Derby)
    wh = tempfile.mkdtemp(prefix="dfmm_vision_wh_")
    url = f"jdbc:derby:{wh}/db;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    jdbc_write(
        selected.select("doc_id", "caption", "mime", "width", "height", "score"),
        url=url, table="curated_assets", pipeline_id="vision-demo",
        task_id="t1", raw_data_id_col="doc_id", array_format="json", **drv,
    )
    back = jdbc_read(
        spark, url, "curated_assets", partition_column="raw_data_id",
        num_partitions=4, lower_bound=0, upper_bound=n0, **drv,
    )
    n5 = back.count()

    print(
        f"assets {n0} -> sized {n1} -> scored>=0.25 {n2} "
        f"(real-pixel BMP cutout+head scored {n2b}; real-video clips "
        f"moving@10-20fps {n2c}, sampled frames {n2f}, "
        f"VAD spans on demuxed soundtracks {n2a}) -> "
        f"near-dup-unique {n3} -> top60% {n4} -> warehouse rows {n5}"
    )
    assert n5 == n4 > 0
    assert n2b > 0
    assert n2c > 0 and n2f >= n2c and n2a > 0
    spark.stop()


if __name__ == "__main__":
    main()
