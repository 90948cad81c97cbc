"""Deterministic synthetic transcript generator.

Produces the engine's canonical input table
``(conv_id, turn_idx, role, text, tool, ts)`` (FIXTURES.md §A1) entirely with
Spark SQL expressions — `spark.range` + `xxhash64`-derived choices — so the
same seed yields the same table at any scale with no driver-side loop and no
wall-clock dependence. Used by tests (tiny), the pytest parity suite (small)
and bench (large).

Injected structure:
* Zipf-ish skew: every ``mega_every``-th conversation has ``mega_turns`` turns
  (exercises salting / AQE skew handling);
* quality defects: ~3/8 of turns carry one of 15 defect texts, each tripping
  exactly one RuleBaseFilter rule (reference rule_base_filter.py:243-354);
* tool-call turns: assistant turn with an embedded ``<tool_call>{json}</tool_call>``
  span followed by a ``role='tool'`` result turn (CEP request→result target);
* ``<answer>...</answer>`` spans on some assistant turns (extraction target,
  reference general_text_answer_evaluator.py:46-52);
* role-alternation violations on ~1/37 turns (CEP violation target);
* near-duplicate / exact-duplicate texts (~1/29 turns) for dedup;
* event time: per-conversation monotone base + bounded ±5s jitter, with a
  3600s session gap every 7 turns (session-window target) and rare 900s-late
  stragglers (~1/101) for watermark drop tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEMPLATES = [
    "Sure, here is the summary you asked for with the key points listed clearly.",
    "The quick brown fox jumps over the lazy dog near the river bank today.",
    "Please check the attached report and let me know your thoughts about it.",
    "Our quarterly revenue grew steadily thanks to the new onboarding flow.",
    "That error usually means the config file path is wrong, try an absolute path.",
    "I compared both options and the second one is cheaper and easier to maintain.",
    "The deployment finished without issues and all health checks are green now.",
    "Thanks for the context, I will look into the logs and report back shortly.",
]

# one defect per quality rule, index-aligned with schema.QUALITY_RULE_NAMES
DEFECTS = [
    "Here is the list you wanted:",                                      # colon_end
    "first line goes on...\nsecond line also trails off...\nthird ok",   # ellipsis
    "a b c d e f g h i j k l m n o p",                                   # mean word len
    "# # # # # # # # spam tags everywhere",                              # symbol ratio
    "this text has &nbsp; entities &amp; more of them",                  # html entity
    "id number 123, id number 456, id number 789 all leaked",            # idcard
    " ".join(f"w{i}" for i in range(120)),                               # no punct span
    "weird glyph ahead � and more text after it",                        # special char
    "Copyright 2024 Example Corp all rights reserved",                   # watermark
    "{a} {b} {c} tiny braces text",                                      # curly ratio
    "THIS IS VERY LOUD SHOUTING TEXT INDEED FRIEND",                     # caps ratio
    "classic filler lorem ipsum dolor sit amet here",                    # lorem ipsum
    " ".join(["spam"] * 40),                                             # unique ratio
    "• first bullet\n• second bullet\n• third bullet",                   # bullet ratio
    "please enable javascript\njavascript required here\njavascript only page\njavascript wall", # javascript
]

TOOLS = ["search_web", "run_code", "fetch_url", "query_db"]

_EPOCH = "timestamp'2025-01-01 00:00:00'"


def transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    seed: int = 42,
    mega_every: int = 200,
    mega_turns: int = 400,
    slices: int | None = None,
) -> DataFrame:
    """Build the transcript DataFrame lazily; ~9 avg turns/conv."""
    tpl = ", ".join("'%s'" % t.replace("'", "''") for t in TEMPLATES)
    dfx = ", ".join("'%s'" % t.replace("'", "''").replace("\n", "\\n") for t in DEFECTS)
    tools = ", ".join(f"'{t}'" for t in TOOLS)
    s = seed

    df = spark.range(0, n_convs, numPartitions=slices or spark.sparkContext.defaultParallelism)
    return (
        df.withColumn(
            "n_turns",
            F.expr(
                f"CASE WHEN id % {mega_every} = 1 THEN {mega_turns} "
                f"ELSE 4 + pmod(xxhash64('nt', id, {s}), 12) END"
            ).cast("int"),
        )
        .select(
            F.col("id").alias("conv"),
            F.explode(F.expr("sequence(0, n_turns - 1)")).alias("turn_idx"),
        )
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn("conv_id", F.format_string("conv-%08d", "conv"))
        .withColumn("h", F.expr(f"xxhash64('h', conv, turn_idx, {s})"))
        .withColumn(
            "toolreq",
            F.expr(f"pmod(xxhash64('tool', conv, turn_idx, {s}), 11) = 0"),
        )
        .withColumn(
            "prev_toolreq",
            F.expr(
                f"turn_idx > 0 AND pmod(xxhash64('tool', conv, turn_idx - 1, {s}), 11) = 0"
            ),
        )
        .withColumn(
            "role",
            F.expr(
                "CASE WHEN prev_toolreq THEN 'tool' "
                "WHEN toolreq THEN 'assistant' "
                "WHEN pmod(h, 37) = 0 THEN (CASE WHEN turn_idx % 2 = 0 THEN 'assistant' ELSE 'user' END) "
                "WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END"
            ),
        )
        .withColumn(
            "tool",
            F.expr(
                f"CASE WHEN toolreq OR prev_toolreq THEN "
                f"element_at(array({tools}), cast(pmod(xxhash64('tn', conv, CASE WHEN prev_toolreq THEN turn_idx - 1 ELSE turn_idx END, {s}), 4) + 1 AS int)) "
                f"ELSE NULL END"
            ),
        )
        .withColumn(
            "base_text",
            F.expr(
                f"CASE "
                # near/exact duplicates of template 0
                f"WHEN pmod(xxhash64('dup', conv, turn_idx, {s}), 29) = 0 THEN element_at(array({tpl}), 1) "
                # defect injection
                f"WHEN pmod(xxhash64('defect', conv, turn_idx, {s}), 40) < 15 THEN "
                f"  element_at(array({dfx}), cast(pmod(xxhash64('defect', conv, turn_idx, {s}), 40) + 1 AS int)) "
                f"ELSE element_at(array({tpl}), cast(pmod(xxhash64('tpl', conv, turn_idx, {s}), 8) + 1 AS int)) END"
            ),
        )
        .withColumn(
            "text",
            F.expr(
                f"CASE "
                f"WHEN role = 'tool' THEN concat('<tool_result>', tool, ' ok rows=', pmod(h, 100), '</tool_result>') "
                f"WHEN toolreq THEN concat(base_text, ' <tool_call>{{\"name\": \"', tool, '\", \"args\": {{\"q\": \"item-', pmod(h, 1000), '\"}}}}</tool_call>') "
                f"WHEN role = 'assistant' AND pmod(xxhash64('ans', conv, turn_idx, {s}), 13) = 0 THEN concat(base_text, ' <answer> ', pmod(h, 500), ' </answer>') "
                f"ELSE base_text END"
            ),
        )
        .withColumn(
            "ts",
            F.expr(
                f"{_EPOCH} + make_interval(0, 0, 0, 0, 0, 0, "
                f"conv * 37 + turn_idx * 30 + floor(turn_idx / 7) * 3600 "
                f"+ (pmod(xxhash64('j', conv, turn_idx, {s}), 11) - 5) "
                f"- (CASE WHEN pmod(xxhash64('late', conv, turn_idx, {s}), 101) = 0 THEN 900 ELSE 0 END))"
            ),
        )
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int,
    seed: int = 42,
    files: int = 16,
    shuffle_arrival: bool = True,
    **kw,
) -> str:
    """Materialize to parquet. ``shuffle_arrival`` orders rows by a hash so a
    file-based stream replays them out of event-time order (late-data tests)."""
    df = transcripts(spark, n_convs=n_convs, seed=seed, **kw)
    if shuffle_arrival:
        df = df.repartition(files, F.xxhash64("conv_id", "turn_idx"))
    else:
        df = df.repartition(files, "conv_id")
    df.write.mode("overwrite").parquet(path)
    return path
