"""End-to-end transcript data-prep pipeline — the migration example.

Mirrors the reference's pipeline entry point shape
(statics/pipelines/gpu_pipelines/video_clip_and_filter_pipeline.py:126-216:
construct operators → run them in sequence over a storage handle) in both
styles this engine supports:

1. the *lazy* style (idiomatic): operators are DataFrame → DataFrame
   functions composed into ONE Catalyst plan — no intermediate files;
2. the *step* style (reference-compatible): StepStorage materializes a
   parquet snapshot between operators, for users porting FileStorage
   pipelines one step at a time.

Run:  python examples/transcript_prep_pipeline.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataflow_mm_spark.datagen import transcripts  # noqa: E402
from dataflow_mm_spark.functions.extraction import (  # noqa: E402
    extract_answer,
    extract_tool_call_names,
)
from dataflow_mm_spark.functions.quality import with_quality  # noqa: E402
from dataflow_mm_spark.operators.conversation import assemble_messages  # noqa: E402
from dataflow_mm_spark.operators.topk import keep_top_ratio  # noqa: E402
from dataflow_mm_spark.operators.windows import session_agg_batch  # noqa: E402
from dataflow_mm_spark.session import get_spark  # noqa: E402
from dataflow_mm_spark.sources.io import StepStorage, write_any  # noqa: E402


def lazy_pipeline(spark, out_dir: str) -> None:
    """One lazy plan: generate → quality → filter → extract → dedup →
    sessionize → assemble → write. Catalyst fuses the stateless stages;
    the only shuffles are dedup, sessionization and message assembly."""
    turns = transcripts(spark, n_convs=2000, seed=42)

    enriched = with_quality(turns).filter(F.col("quality.pass")).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        extract_answer(F.col("text")).alias("answer"),
        extract_tool_call_names(F.col("text")).alias("tool_calls"),
    )
    # annotate global exact-duplicate turns (templated corpora repeat a lot —
    # marking keeps the conversation structure intact for downstream ops)
    from dataflow_mm_spark.functions.dedup import dedup_mark

    marked = dedup_mark(
        enriched.withColumn("doc_id", F.xxhash64("conv_id", "turn_idx")),
        text_col="text",
        id_col="doc_id",
    ).drop("doc_id")

    sessions = session_agg_batch(marked, gap_seconds=1800)
    # n_turns is a low-cardinality integer score: the approximate percentile
    # cut is tie-INCLUSIVE, so the kept fraction can exceed 0.5 by the tie
    # mass at the boundary (documented in keep_top_ratio) — acceptable for a
    # keep-the-longer-sessions heuristic; pass exact=True for a strict cut.
    top_sessions = keep_top_ratio(sessions, "n_turns", keep_ratio=0.5)
    messages = assemble_messages(marked)

    write_any(marked, os.path.join(out_dir, "turns_clean"))
    write_any(top_sessions, os.path.join(out_dir, "sessions_top"))
    write_any(messages, os.path.join(out_dir, "messages"))
    print(
        "lazy pipeline:",
        marked.count(), "clean turns |",
        top_sessions.count(), "kept sessions |",
        messages.count(), "conversations",
    )


def step_pipeline(spark, out_dir: str) -> None:
    """Reference-rhythm variant: one materialized snapshot per operator."""
    entry = os.path.join(out_dir, "entry")
    write_any(transcripts(spark, n_convs=500, seed=42), entry)
    st = StepStorage(spark, entry, os.path.join(out_dir, "cache"), prefix="prep")

    df = st.read()  # step 0: raw
    st.write(with_quality(df).filter(F.col("quality.pass")).drop("quality"))
    st.step()

    df = st.read()  # step 1: quality-filtered
    st.write(
        df.withColumn("answer", extract_answer(F.col("text")))
    )
    st.step()

    df = st.read()  # step 2: with answers
    print("step pipeline rows at final step:", df.count())


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="dfmm_ex_")
    spark = get_spark("example", master="local[8]")
    lazy_pipeline(spark, os.path.join(out_dir, "lazy"))
    step_pipeline(spark, os.path.join(out_dir, "step"))
    print("outputs under", out_dir)


if __name__ == "__main__":
    main()
