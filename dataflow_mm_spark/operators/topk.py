"""Sorts / limits / top-k / percentile cuts (SURVEY.md §2.10).

* ``keep_top_ratio`` — CLIPScoreFilter/KNNSimilarityFilter keep-ratio
  percentile cut (clipscore_filter.py:192-199): exact percentile via
  percent_rank (matches np.percentile-style cuts at test scale; at warehouse
  scale swap the window for ``percentile_approx`` — one pass, no global sort);
* ``top_k`` — DataTailorFilter argsort selection (datatailor_filter.py:363-372);
* ``seeded_sample_cap`` — MCTSTreeRefiner's seeded 10k sample cap
  (mcts_tree_refiner.py:96-97): rand(seed)-ordered row_number;
* ``order_nulls_last`` — VideoInfoFilter's num_frames sort with None last
  (video_info_filter.py:338-343).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_top_ratio(
    df: DataFrame,
    score_col: str,
    keep_ratio: float = 0.8,
    ascending: bool = False,
    approx: bool = False,
) -> DataFrame:
    """Keep the best ``keep_ratio`` fraction by score. ``approx=True`` uses a
    percentile_approx threshold (single pass, scale path); default is the
    exact percent_rank cut."""
    if approx:
        q = keep_ratio if ascending else 1.0 - keep_ratio
        thr = df.agg(
            F.percentile_approx(score_col, F.lit(q), F.lit(10000)).alias("t")
        ).first().t
        cond = F.col(score_col) <= thr if ascending else F.col(score_col) >= thr
        return df.filter(cond)
    order = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w = Window.orderBy(order)
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_ratio)
        .drop("_pr")
    )


def top_k(
    df: DataFrame,
    score_col: str,
    k: int,
    keys: tuple[str, ...] = (),
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    order = [F.col(score_col).asc() if ascending else F.col(score_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def seeded_sample_cap(df: DataFrame, cap: int, seed: int = 42) -> DataFrame:
    """Deterministic pseudo-random cap: order by rand(seed), keep first
    ``cap``. Same seed + same input → same rows."""
    w = Window.orderBy(F.rand(seed), F.monotonically_increasing_id())
    return df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= cap
    ).drop("_rn")


def order_nulls_last(df: DataFrame, col: str, ascending: bool = True) -> DataFrame:
    c = F.col(col).asc_nulls_last() if ascending else F.col(col).desc_nulls_last()
    return df.orderBy(c)
