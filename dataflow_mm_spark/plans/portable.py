"""Oracle-portable synthetic transcript layer.

Round-1 gap: the transcript CEP / sessionization / quality-window queries ran
on driver-invisible in-memory datagen (xxhash64 — not reproducible in DuckDB),
so the correctness gate could only count rows. This module derives the SAME
transcript structure (tool-call→result turns, role-alternation violations,
quality defects, duplicates) from the oracle-visible ``events`` parquet table
using ONLY portable expressions:

* 60-bit hash: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
  DuckDB ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` — bit-identical
  (verified), non-negative, so ``%`` agrees on both engines;
* row source / event time: the events table itself (conv_id = user_id,
  turn_idx = dense per-user event order) — real timestamps with session gaps.

``synthetic_turns`` (Spark) and ``SYNTH_TURNS_SQL`` (DuckDB) are built from
the same Python constants so they cannot drift independently. The xxhash64
generator in ``datagen.py`` remains the (faster, scale-friendly) perf-bench
input; this one exists for the driver's value-hash gate.

Reference semantics being exercised: role alternation + tool request→result
CEP (north rule), RuleBaseFilter defects (rule_base_filter.py:243-354),
``<answer>`` spans (general_text_answer_evaluator.py:46-52).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataflow_mm_spark.datagen import DEFECTS, TEMPLATES, TOOLS

# ---------------------------------------------------------------------------
# portable 60-bit hash
# ---------------------------------------------------------------------------


def phash(tag: str, *cols: Column) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 over ':'-joined args.
    60 bits keeps the value positive in an int64 on both engines."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(tag), *cols)), 1, 15), 16, 10
    ).cast("bigint")


def phash_sql(tag: str, *exprs: str) -> str:
    args = ", ".join([f"'{tag}'", *exprs])
    return f"CAST('0x' || substr(md5(concat_ws(':', {args})), 1, 15) AS BIGINT)"


def sql_str(s: str) -> str:
    """DuckDB string literal for a Python string (newline-safe: DuckDB
    single-quoted literals have no escape sequences)."""
    esc = s.replace("'", "''")
    if "\n" in esc:
        parts = esc.split("\n")
        return "(" + " || chr(10) || ".join(f"'{p}'" for p in parts) + ")"
    return f"'{esc}'"


def sql_array(items: list[str]) -> str:
    return "[" + ", ".join(sql_str(s) for s in items) + "]"


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def synthetic_turns(
    spark: SparkSession, sf_dir: str, spread: int | None = None
) -> DataFrame:
    """(conv_id, turn_idx, role, text, tool, ts) derived from events.parquet
    with the portable hash — same distributional structure as
    datagen.transcripts (tool calls ~1/11, violations ~1/37, defects 15/40,
    dups ~1/29, answers ~1/13).

    ``spread``: repartition the turn-numbering window's output BEFORE the
    md5 projection — AQE coalesces the window shuffle to one partition at
    gate scale, and a repartition placed after the projection would spread
    only the write, leaving the ~16-phash/row tax single-threaded (r6)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # partition the turn-numbering window on the STRING conv_id (not the long
    # user_id): the cast is injective so grouping is identical, and every
    # downstream window/CEP/session keys on conv_id — one exchange feeds the
    # whole pipeline instead of user_id-shuffle + conv_id-reshuffle (plan
    # audited: single hashpartitioning(conv_id))
    t0 = ev.select(
        F.col("user_id").cast("string").alias("conv_id"), "ts", "event_id"
    )
    w = Window.partitionBy("conv_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t = t0.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("long").alias("turn_idx"),
        "ts",
    )
    if spread:
        t = t.repartition(spread)
    cid = F.col("conv_id")
    ti = F.col("turn_idx").cast("string")
    ti_prev = (F.col("turn_idx") - 1).cast("string")

    toolreq = phash("tool", cid, ti) % 11 == 0
    prev_toolreq = (F.col("turn_idx") > 0) & (phash("tool", cid, ti_prev) % 11 == 0)
    viol = phash("viol", cid, ti) % 37 == 0
    parity_role = F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant")
    flipped_role = F.when(F.col("turn_idx") % 2 == 0, "assistant").otherwise("user")
    role = (
        F.when(prev_toolreq, "tool")
        .when(toolreq, "assistant")
        .when(viol, flipped_role)
        .otherwise(parity_role)
    )
    tools_arr = F.array(*[F.lit(x) for x in TOOLS])
    tool_ti = F.when(prev_toolreq, ti_prev).otherwise(ti)
    tool = F.when(
        toolreq | prev_toolreq,
        F.element_at(tools_arr, (phash("tn", cid, tool_ti) % 4 + 1).cast("int")),
    )

    dfv = phash("def", cid, ti) % 40
    defects_arr = F.array(*[F.lit(x) for x in DEFECTS])
    tpl_arr = F.array(*[F.lit(x) for x in TEMPLATES])
    base = (
        F.when(phash("dup", cid, ti) % 29 == 0, F.lit(TEMPLATES[0]))
        .when(dfv < 15, F.element_at(defects_arr, (dfv + 1).cast("int")))
        .otherwise(
            F.element_at(tpl_arr, (phash("tpl", cid, ti) % 8 + 1).cast("int"))
        )
    )
    hh = phash("h", cid, ti)
    text = (
        F.when(
            role == "tool",
            F.concat(
                F.lit("<tool_result>"), tool, F.lit(" ok rows="),
                (hh % 100).cast("string"), F.lit("</tool_result>"),
            ),
        )
        .when(
            toolreq,
            F.concat(
                base, F.lit(' <tool_call>{"name": "'), tool,
                F.lit('", "args": {"q": "item-'), (hh % 1000).cast("string"),
                F.lit('"}}</tool_call>'),
            ),
        )
        .when(
            (role == "assistant") & (phash("ans", cid, ti) % 13 == 0),
            F.concat(base, F.lit(" <answer> "), (hh % 500).cast("string"), F.lit(" </answer>")),
        )
        .otherwise(base)
    )
    return t.select(
        "conv_id", "turn_idx", role.alias("role"), text.alias("text"),
        tool.alias("tool"), "ts",
    )


_SYNTH_CACHE: dict[tuple[str, str], str] = {}


def synthetic_turns_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``synthetic_turns`` materialized ONCE per (Spark application, sf_dir)
    and read back from parquet thereafter.  The portable synth pays a real
    md5 tax (~16 phash evaluations per row — measured ~3-10s of wall at
    sf0.1, BENCH.md §8); ten gate queries consume the same rows, so without
    this memo the registry wall pays that tax ten times per session.  Rows
    are bit-identical to ``synthetic_turns`` (deterministic expressions,
    parquet round-trip); downstream filters/projections push down into the
    scan instead of re-inlining md5 subtrees.  The cache directory is
    removed at interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    path = _SYNTH_CACHE.get(key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix="dfmm_synth_cache_")
        # repartition to cluster parallelism before the write: AQE coalesces
        # the row_number window's post-shuffle partitions to ONE at gate
        # scale, so without this the cache is a single file/row-group and
        # EVERY downstream consumer runs single-task (measured r6: the full
        # quality_struct pass over the cache 4.6 s at 1 partition vs 0.55 s
        # at 32 — guide §2, parallelism must survive the materialization).
        # defaultParallelism is cluster-derived, not a local constant.
        # max(8, cores/4): consumers are compile/overhead-dominated at gate
        # scale, so 8 wide beats 32 (A/B r6: quality_windows first-run 6.8s
        # at 32 files vs 5.6s at 8, contract_suite 1.9 vs 1.4) while still
        # breaking the 1-file serialization; scales with the cluster.
        n = max(8, spark.sparkContext.defaultParallelism // 4)
        synthetic_turns(spark, sf_dir, spread=n).write.mode(
            "overwrite"
        ).parquet(path)
        _SYNTH_CACHE[key] = path
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# DuckDB side (same constants, same CASE order)
# ---------------------------------------------------------------------------

_TI = "CAST(turn_idx AS VARCHAR)"
_TI_PREV = "CAST(turn_idx - 1 AS VARCHAR)"

SYNTH_TURNS_SQL = f"""
  WITH _e AS (
    SELECT CAST(user_id AS VARCHAR) AS conv_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS turn_idx,
           ts
    FROM events
  ), _s1 AS (
    SELECT conv_id, turn_idx, ts,
           {phash_sql('tool', 'conv_id', _TI)} % 11 = 0 AS toolreq,
           turn_idx > 0 AND {phash_sql('tool', 'conv_id', _TI_PREV)} % 11 = 0 AS prev_toolreq,
           {phash_sql('viol', 'conv_id', _TI)} % 37 = 0 AS viol,
           {phash_sql('dup', 'conv_id', _TI)} % 29 = 0 AS dup,
           {phash_sql('def', 'conv_id', _TI)} % 40 AS dfv,
           {phash_sql('tpl', 'conv_id', _TI)} % 8 AS tplv,
           {phash_sql('ans', 'conv_id', _TI)} % 13 = 0 AS ansflag,
           {phash_sql('h', 'conv_id', _TI)} AS hh
    FROM _e
  ), _s2 AS (
    SELECT *,
      CASE WHEN prev_toolreq THEN 'tool'
           WHEN toolreq THEN 'assistant'
           WHEN viol THEN (CASE WHEN turn_idx % 2 = 0 THEN 'assistant' ELSE 'user' END)
           WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      CASE WHEN toolreq OR prev_toolreq THEN
        ({sql_array(TOOLS)})[CAST({phash_sql('tn', 'conv_id',
            '(CASE WHEN prev_toolreq THEN ' + _TI_PREV + ' ELSE ' + _TI + ' END)')} % 4 AS INT) + 1]
      END AS tool
    FROM _s1
  ), _s3 AS (
    SELECT *,
      CASE WHEN dup THEN {sql_str(TEMPLATES[0])}
           WHEN dfv < 15 THEN ({sql_array(DEFECTS)})[CAST(dfv AS INT) + 1]
           ELSE ({sql_array(TEMPLATES)})[CAST(tplv AS INT) + 1] END AS base_text
    FROM _s2
  )
  SELECT conv_id, turn_idx, role,
    CASE WHEN role = 'tool' THEN
           '<tool_result>' || tool || ' ok rows=' || CAST(hh % 100 AS VARCHAR) || '</tool_result>'
         WHEN toolreq THEN
           base_text || ' <tool_call>{{"name": "' || tool
             || '", "args": {{"q": "item-' || CAST(hh % 1000 AS VARCHAR) || '"}}}}</tool_call>'
         WHEN role = 'assistant' AND ansflag THEN
           base_text || ' <answer> ' || CAST(hh % 500 AS VARCHAR) || ' </answer>'
         ELSE base_text END AS text,
    tool, ts
  FROM _s3
"""
