"""Stream-stream joins — cross-turn context assembly (north rule).

Joins the turns stream with itself: each turn picks up its predecessor's
role/text (the context a consistency-filter analogue needs, SURVEY §2.3 F11).
Spark's stream-stream inner join requires watermarks on both sides plus an
event-time range constraint so state can be evicted: a previous turn is kept
only while ``cur.ts ∈ [prev.ts, prev.ts + max_gap]``. Pairs farther apart in
event time than ``max_gap`` are therefore not produced — by design: context
older than the gap is stale, and unbounded state is the alternative.

State is keyed by conv_id (the equi-join key) — the same salting/AQE story
as the aggregations applies (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prev_turn_context_stream(
    turns: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "1 hour",
) -> DataFrame:
    """turns (streaming, NOT yet watermarked) → one row per turn that has a
    predecessor within ``max_gap``: (conv_id, turn_idx, role, text, ts,
    prev_role, prev_text, prev_ts)."""
    cur = (
        turns.withWatermark("ts", watermark)
        .select("conv_id", "turn_idx", "role", "text", "ts")
        .alias("cur")
    )
    prev = (
        turns.withWatermark("ts", watermark)
        .select(
            F.col("conv_id").alias("p_conv"),
            F.col("turn_idx").alias("p_idx"),
            F.col("role").alias("prev_role"),
            F.col("text").alias("prev_text"),
            F.col("ts").alias("prev_ts"),
        )
        .alias("prev")
    )
    cond = (
        (F.col("cur.conv_id") == F.col("p_conv"))
        & (F.col("cur.turn_idx") == F.col("p_idx") + 1)
        & (F.col("cur.ts") >= F.col("prev_ts"))
        & (F.col("cur.ts") <= F.col("prev_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return cur.join(prev, cond, "inner").select(
        "cur.conv_id",
        "cur.turn_idx",
        "cur.role",
        "cur.text",
        "cur.ts",
        "prev_role",
        "prev_text",
        "prev_ts",
    )
