"""Skew-aware repartitioning and salted two-phase aggregation.

North rule: "salted, skew-aware repartitioning on conv_id hash". Mega-
conversations (datagen plants one every 200 convs with ~400 turns; real agent
traces are worse) make a plain ``groupBy(conv_id)`` shuffle put one key's
entire payload on one task. Mitigations, composable:

* ``repartition_by_key`` — explicit hash repartition before stateful stages
  (lets the state operator reuse the layout instead of re-shuffling);
* ``salted_agg`` — classic two-phase aggregation: partial aggregate on
  (key, salt) — map-side combine already shrinks it — then final aggregate
  on key. Correct for decomposable aggregates (count/sum/min/max, and avg
  via sum+count);
* AQE skew-join splitting is enabled globally in session.py for the join
  side of the problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_by_key(df: DataFrame, key: str = "conv_id", n: int | None = None) -> DataFrame:
    return df.repartition(n, F.col(key)) if n else df.repartition(F.col(key))


def with_salt(df: DataFrame, key: str = "conv_id", buckets: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic row-level salt: pmod(xxhash64(key, turn_idx-ish cols), B).
    Uses all columns' hash when no secondary column exists."""
    cols = [key] + [c for c in ("turn_idx", "ts", "event_id") if c in df.columns]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int"))


def heavy_hitter_keys(
    df: DataFrame,
    key: str = "conv_id",
    min_frac: float = 0.001,
    max_keys: int = 10_000,
) -> DataFrame:
    """Exact heavy-hitter detection — keys carrying ≥ ``min_frac`` of rows
    → (key, n, frac), heaviest first, capped at ``max_keys``.

    Safe to run on the very data whose skew it measures: a count
    aggregation is NOT skew-vulnerable (map-side partial aggregation
    collapses a hot key to ONE row per input partition before the shuffle,
    so the hot key ships ~n_partitions rows, not its payload). The
    distinct-key-sized counts relation is ``.cache()``d (MEMORY_AND_DISK)
    because it has two consumers — the eager ``total`` action here and the
    returned (filtered) DataFrame — and filter-pushdown would otherwise
    re-inline the groupBy into both, scanning ``df`` twice (CLAUDE.md
    cache-multi-consumer rule; r4 ADVICE). Callers in long-lived sessions
    may ``spark.catalog.clearCache()`` once the hot-key set is consumed.
    Output is broadcast-sized by construction (``max_keys`` rows) — feed
    it straight to ``salted_agg_selective``."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n")).cache()
    total = counts.agg(F.sum("n")).first()[0] or 0
    if total == 0:
        return counts.withColumn("frac", F.col("n").cast("double")).limit(0)
    return (
        counts.filter(F.col("n") >= float(min_frac) * total)
        .withColumn("frac", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"), key)
        .limit(max_keys)
    )


def salted_agg(
    df: DataFrame,
    key: str = "conv_id",
    buckets: int = 16,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps output name → one of
    count/sum:<col>/min:<col>/max:<col>/avg:<col>. Phase 1 groups on
    (key, salt) so a hot key spreads over ``buckets`` tasks; phase 2 merges
    the partials on key alone (tiny input: buckets rows per key)."""
    aggs = aggs or {"n_turns": "count"}
    salted = with_salt(df, key, buckets)
    return _two_phase(salted, key, aggs)


def salted_agg_selective(
    df: DataFrame,
    key: str,
    hot_keys: DataFrame,
    buckets: int = 16,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """``salted_agg`` that salts ONLY the keys in ``hot_keys`` (broadcast;
    the output of ``heavy_hitter_keys``). The 100 TB form: blanket salting
    multiplies phase-1 output by ``buckets`` for EVERY key — with billions
    of cold keys that is the dominant shuffle — while selective salting
    pays the blowup only on the handful of keys that need it (cold keys
    keep salt 0 and merge 1:1 in phase 2)."""
    aggs = aggs or {"n_turns": "count"}
    hot = F.broadcast(
        hot_keys.select(F.col(key)).withColumn("_hot", F.lit(True))
    )
    salted = (
        with_salt(df, key, buckets)
        .join(hot, on=key, how="left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(), F.col("_salt")).otherwise(
                F.lit(0)
            ),
        )
        .drop("_hot")
    )
    return _two_phase(salted, key, aggs)


def _two_phase(
    salted: DataFrame, key: str, aggs: dict[str, str]
) -> DataFrame:
    partial_exprs, final_exprs = [], []
    for name, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count("*").alias(f"_p_{name}"))
            final_exprs.append(F.sum(f"_p_{name}").alias(name))
        else:
            op, col = spec.split(":", 1)
            if op == "sum":
                partial_exprs.append(F.sum(col).alias(f"_p_{name}"))
                final_exprs.append(F.sum(f"_p_{name}").alias(name))
            elif op == "min":
                partial_exprs.append(F.min(col).alias(f"_p_{name}"))
                final_exprs.append(F.min(f"_p_{name}").alias(name))
            elif op == "max":
                partial_exprs.append(F.max(col).alias(f"_p_{name}"))
                final_exprs.append(F.max(f"_p_{name}").alias(name))
            elif op == "avg":
                partial_exprs.append(F.sum(col).alias(f"_ps_{name}"))
                partial_exprs.append(F.count(col).alias(f"_pc_{name}"))
                final_exprs.append(
                    (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
                )
            else:
                raise ValueError(f"unsupported agg: {spec}")

    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
