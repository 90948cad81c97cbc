"""Conversation formatting — Conversation2Message re-expressed.

Reference: dataflow/operators/conversations/format/conversation_to_message.py
(:31-47 token parse, :49-104 assembly). Two Spark-native forms:

* ``assemble_messages`` — over the engine's normalized one-row-per-turn model:
  per-turn cleanup is a Catalyst expression, conversation re-assembly is
  ``collect_list(struct(...))`` + ``array_sort`` (stable (conv_id, turn_idx)
  ordering), system prompt prepended. One shuffle on conv_id.

* ``conversation_to_message_nested`` — the reference's native nested shape
  (``conversation: array<struct<from,value>>`` + parallel modal path arrays).
  The running modal-path index interleave is computed with array higher-order
  functions (transform + aggregate prefix sums) — fully JVM-side, no UDF.

Deviation from reference: a modal-token/path-count mismatch raises ValueError
in the reference (:92); here it sets ``message_error=true`` and nulls the
message (a streaming job must not throw per-row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SYSTEM_PROMPT = "You are a helpful assistant."

_MODALS = ["image", "video", "audio"]


def _count_tokens(text: Column, modal: str) -> Column:
    return F.coalesce(
        F.regexp_count(text, F.lit(f"<{modal}>")), F.lit(0)
    )


def clean_turn_text(text: Column) -> Column:
    """Strip <image>/<video>/<audio> tokens, collapse blank lines, trim
    (reference _parse_multimodal_tokens :31-47)."""
    t = text
    for m in _MODALS:
        t = F.replace(t, F.lit(f"<{m}>"), F.lit(""))
    return F.trim(F.regexp_replace(F.trim(t), r"\n+", "\n"))


def map_role(role: Column) -> Column:
    """human→user, gpt→assistant; engine-native roles pass through."""
    return (
        F.when(role == "human", "user")
        .when(role == "gpt", "assistant")
        .otherwise(role)
    )


def assemble_messages(
    df: DataFrame,
    system_prompt: str = DEFAULT_SYSTEM_PROMPT,
    drop_empty_turns: bool = True,
) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, ...) → one row per conversation
    with ``message: array<struct<role,content>>`` ordered by turn_idx and a
    system turn prepended."""
    cleaned = df.select(
        "conv_id",
        "turn_idx",
        map_role(F.col("role")).alias("role"),
        clean_turn_text(F.col("text")).alias("content"),
    )
    if drop_empty_turns:
        cleaned = cleaned.filter(F.col("content") != "")
    grouped = cleaned.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "content"))
        ).alias("turns"),
        F.count("*").alias("n_turns"),
    )
    sys_turn = F.struct(
        F.lit("system").alias("role"), F.lit(system_prompt).alias("content")
    )
    return grouped.select(
        "conv_id",
        "n_turns",
        F.concat(
            F.array(sys_turn),
            F.transform(
                "turns",
                lambda t: F.struct(
                    t["role"].alias("role"), t["content"].alias("content")
                ),
            ),
        ).alias("message"),
    )


def conversation_to_message_nested(
    df: DataFrame,
    conversation_col: str = "conversation",
    image_col: str = "image",
    video_col: str = "video",
    audio_col: str = "audio",
    system_prompt: str = DEFAULT_SYSTEM_PROMPT,
    out: str = "message",
) -> DataFrame:
    """Reference-shaped input: one row per conversation, nested turn array
    plus parallel modal-path arrays. Emits ``message`` as
    array<struct<role, content: array<struct<type, value>>>>."""
    conv = F.col(conversation_col)
    paths = {m: F.coalesce(F.col(c), F.array()) for m, c in
             zip(_MODALS, [image_col, video_col, audio_col])}

    def _counter(modal: str):
        return lambda t: _count_tokens(t["value"], modal)

    counts = {m: F.transform(conv, _counter(m)) for m in _MODALS}
    # mismatch if total tokens of any modality exceed provided paths
    mismatch = None
    for m in _MODALS:
        bad = F.aggregate(counts[m], F.lit(0), lambda a, c: a + c) > F.size(paths[m])
        mismatch = bad if mismatch is None else (mismatch | bad)

    def build_turn(t: Column, i: Column) -> Column:
        role = map_role(t["from"])
        cleaned = clean_turn_text(t["value"])
        parts = []
        for m in _MODALS:
            start = F.aggregate(
                F.slice(counts[m], F.lit(1), i), F.lit(0), lambda a, c: a + c
            )
            n = _count_tokens(t["value"], m)
            parts.append(
                F.transform(
                    F.slice(paths[m], start + 1, n),
                    lambda p: F.struct(F.lit(m).alias("type"), p.alias("value")),
                )
            )
        text_part = F.when(
            cleaned != "",
            F.array(F.struct(F.lit("text").alias("type"), cleaned.alias("value"))),
        ).otherwise(F.array().cast("array<struct<type:string,value:string>>"))
        content = F.concat(*parts, text_part)
        return F.struct(role.alias("role"), content.alias("content"))

    sys_turn = F.struct(
        F.lit("system").alias("role"),
        F.array(
            F.struct(F.lit("text").alias("type"), F.lit(system_prompt).alias("value"))
        ).alias("content"),
    )
    turns = F.filter(
        F.transform(conv, build_turn), lambda t: F.size(t["content"]) > 0
    )
    message = F.concat(F.array(sys_turn), turns)
    return df.withColumn("message_error", F.coalesce(mismatch, F.lit(False))).withColumn(
        out, F.when(F.col("message_error"), F.lit(None)).otherwise(message)
    )
