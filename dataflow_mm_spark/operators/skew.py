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
