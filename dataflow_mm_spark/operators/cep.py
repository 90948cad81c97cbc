"""CEP pattern detection over turn sequences — batch analogues.

The streaming versions (applyInPandasWithState with event-time timeout) live
in streaming/cep.py; these batch forms share the same pattern definitions and
serve as their replay oracles plus the DuckDB-checkable driver queries.

Patterns (north rule: role alternation, tool-invocation sequences):
* role-alternation violation — a user/assistant turn whose previous
  non-system turn has the same role (reference analogue: ordered
  frame-pair state in video_motion_score_filter.py:173-236);
* tool request→result pairing — an assistant turn carrying a tool call must
  be followed by a ``role='tool'`` turn with the same tool name; emits
  pairing status + latency (reference analogue: MCTS chain extraction,
  mcts_tree_refiner.py:30-63 — sequence patterns over ordered nodes);
* event sequence (A then B within Δt) over arbitrary event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataflow_mm_spark.functions.extraction import extract_tool_call_names
from dataflow_mm_spark.functions.timeutil import epoch_seconds


def _turn_window(keys=("conv_id",), order=("turn_idx",)):
    return Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])


def role_violations(df: DataFrame) -> DataFrame:
    """Turns violating user/assistant alternation: same role as the previous
    turn (tool/system turns are transparent — skipped for adjacency)."""
    ua = df.filter(F.col("role").isin("user", "assistant"))
    w = _turn_window()
    return (
        ua.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_turn_idx", F.lag("turn_idx").over(w))
        .filter(F.col("prev_role") == F.col("role"))
        .select("conv_id", "turn_idx", "role", "prev_turn_idx", "prev_role", "ts")
    )


def tool_pairing(df: DataFrame, max_latency_sec: int | None = None) -> DataFrame:
    """Pair each tool-call turn with the next turn iff it is the matching
    ``role='tool'`` result. Emits one row per tool call:
    (conv_id, turn_idx, tool, paired, result_turn_idx, latency_sec)."""
    w = _turn_window()
    nxt = (
        df.withColumn("next_role", F.lead("role").over(w))
        .withColumn("next_tool", F.lead("tool").over(w))
        .withColumn("next_turn_idx", F.lead("turn_idx").over(w))
        .withColumn("next_ts", F.lead("ts").over(w))
    )
    calls = nxt.filter(
        (F.size(extract_tool_call_names(F.col("text"))) > 0)
        & F.col("tool").isNotNull()
        & (F.col("role") == "assistant")
    )
    # coalesce: a call with NO next turn is unpaired=false, not null (matches
    # the streaming FSM's tool_unpaired emission)
    paired = F.coalesce(
        (F.col("next_role") == "tool") & (F.col("next_tool") == F.col("tool")),
        F.lit(False),
    )
    out = calls.select(
        "conv_id",
        "turn_idx",
        "tool",
        paired.alias("paired"),
        F.when(paired, F.col("next_turn_idx")).cast("double").alias("result_turn_idx"),
        F.when(
            paired,
            F.round(epoch_seconds(F.col("next_ts")) - epoch_seconds(F.col("ts")), 6),
        ).alias("latency_sec"),
    )
    if max_latency_sec is not None:
        out = out.withColumn(
            "paired",
            F.col("paired") & (F.col("latency_sec") <= max_latency_sec),
        )
    return out


def sequence_match(
    df: DataFrame,
    first: str,
    then: str,
    within_sec: int,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Adjacent-pair CEP: rows of type ``then`` whose immediately preceding
    event (per key, event order) is ``first`` and within ``within_sec``."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order_cols])
    prev_t = F.lag(type_col).over(w)
    prev_ts = F.lag(ts_col).over(w)
    return (
        df.withColumn("_pt", prev_t)
        .withColumn("_pts", prev_ts)
        .filter(
            (F.col(type_col) == then)
            & (F.col("_pt") == first)
            & (epoch_seconds(F.col(ts_col)) - epoch_seconds(F.col("_pts")) <= within_sec)
        )
        .select(
            F.col(key),
            F.col("_pts").alias("first_ts"),
            F.col(ts_col).alias("then_ts"),
        )
    )


def ordered_lag_score(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """F5 VideoMotionScore batch analogue
    (video_motion_score_filter.py:173-236): per key, the mean absolute
    step-to-step delta of a metric over the ordered sequence — the
    frame-pair motion statistic generalized to any ordered stream. Deltas
    are int64-quantized (round(|Δ|*1000)) before summing so the aggregate is
    summation-order-free (CLAUDE.md float-exact rule); the mean is two
    divisions of exact integers → bit-identical across engines."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    d = df.withColumn("_prev", F.lag(value_col).over(w))
    q = F.round(F.abs(F.col(value_col) - F.col("_prev")) * 1000).cast("bigint")
    return (
        d.filter(F.col("_prev").isNotNull())
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_steps"), F.sum(q).alias("_mq"))
        .select(
            *key_cols,
            "n_steps",
            (F.col("_mq") / 1000.0 / F.col("n_steps")).alias("motion_score"),
        )
    )
