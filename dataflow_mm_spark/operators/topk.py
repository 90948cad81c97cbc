"""Sorts / limits / top-k / percentile cuts (SURVEY.md §2.10).

* ``keep_top_ratio`` — CLIPScoreFilter/KNNSimilarityFilter keep-ratio
  percentile cut (clipscore_filter.py:192-199). DEFAULT is the scale path:
  a ``percentile_approx`` threshold computed in one pass (partial aggregate,
  no global sort). ``exact=True`` opts into the percent_rank cut, which is a
  single-task global sort — small-N / test-parity use only;
* ``top_k`` — DataTailorFilter argsort selection (datatailor_filter.py:363-372);
* ``seeded_sample_cap`` — MCTSTreeRefiner's seeded 10k sample cap
  (mcts_tree_refiner.py:96-97): rows ordered by a CONTENT hash (xxhash64 of
  all columns + seed), then ``limit(cap)``. Content hashing makes the sample
  independent of physical partitioning (``rand(seed)`` is per-partition
  seeded — a repartition would change the sample), and sort+limit compiles to
  TakeOrderedAndProject: per-partition top-cap, merged on the driver — no
  single-task global sort;
* ``order_nulls_last`` — VideoInfoFilter's num_frames sort with None last
  (video_info_filter.py:338-343).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def keep_top_ratio(
    df: DataFrame,
    score_col: str,
    keep_ratio: float = 0.8,
    ascending: bool = False,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep the best ``keep_ratio`` fraction by score.

    Default path: ``percentile_approx`` threshold + filter — one shuffle-free
    aggregate pass then a pushed-down predicate; survives any scale. The
    threshold row itself is kept inclusively, so the kept fraction can exceed
    keep_ratio by the tie mass at the boundary (np.percentile-style cuts have
    the same property). On LOW-CARDINALITY scores (e.g. small-integer counts)
    the boundary tie mass can be large — an 0.5 cut on a score with ~10
    distinct values may keep 60%+ of the rows. Callers needing an exact
    fraction on tied scores should pass ``exact=True`` (small inputs) or
    pre-jitter with a deterministic tiebreak column.

    ``exact=True``: percent_rank over a GLOBAL sort — one task sorts the
    universe. Only for small inputs where reproducing the reference's exact
    rank cut matters (tests, ≤10^6-row dims).
    """
    if not exact:
        q = keep_ratio if ascending else 1.0 - keep_ratio
        thr = df.agg(
            F.percentile_approx(score_col, F.lit(q), F.lit(accuracy)).alias("t")
        ).first().t
        if thr is None:  # empty input
            return df
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
    if not keys:
        # global top-k: sort+limit → TakeOrderedAndProject (per-partition
        # heads merged on the driver), NOT a one-task window sort
        return df.orderBy(*order).limit(k)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def seeded_sample_cap(
    df: DataFrame, cap: int, seed: int = 42, cols: list[str] | None = None
) -> DataFrame:
    """Deterministic pseudo-random cap: order by a content hash (hashable
    columns + seed), keep first ``cap``. Same seed + same input rows → same
    sample, regardless of partitioning or arrival order; plan is
    TakeOrderedAndProject (scale-safe — no global single-task sort).
    ``cols`` restricts the hash to a stable key subset; by default map-typed
    columns are excluded (Spark rejects hashing MapType)."""
    if cols is None:
        cols = [f.name for f in df.schema if not isinstance(f.dataType, MapType)]
    h = F.xxhash64(*[F.col(c) for c in cols], F.lit(seed))
    return df.orderBy(h.asc()).limit(cap)


def rank_normalize(
    df: DataFrame, col: str, out: str, tiebreak: str, round_to: int = 6,
    n: int | None = None, approx_threshold: int = 1_000_000,
    n_quantiles: int = 1000,
) -> DataFrame:
    """Rank normalization to [0,1] — DataTailor's per-metric normalization
    (datatailor_filter.py:351-362, argsort-based).

    Exact path (n ≤ approx_threshold): (rank-1)/(n-1) over (round(col),
    tiebreak) order — ranks on the ROUNDED value so the DuckDB oracle (which
    sees the same 6dp values) orders identically. A global one-task sort:
    correct reference semantics, small-N only.

    Scale path (n > approx_threshold): quantile ECDF — one
    ``percentile_approx`` aggregate (no global sort, no shuffle beyond the
    partial agg) yields ``n_quantiles`` boundaries; each row's normalized
    rank is the fraction of boundaries ≤ its value, evaluated as a JVM HOF
    over the broadcast boundary array. ±1/n_quantiles resolution."""
    if n is None:
        n = df.count()
    if n > approx_threshold:
        probs = [i / n_quantiles for i in range(1, n_quantiles + 1)]
        qs = df.agg(
            F.percentile_approx(
                col, F.array(*[F.lit(p) for p in probs]), F.lit(10000)
            ).alias("q")
        ).first().q
        if qs is None:  # all-NULL score column
            return df.withColumn(out, F.lit(0.0))
        bounds = F.array(*[F.lit(float(b)) for b in qs])
        frac = F.size(F.filter(bounds, lambda b: b <= F.col(col))) / float(n_quantiles)
        return df.withColumn(out, frac)
    w = Window.orderBy(F.round(F.col(col), round_to).asc(), F.col(tiebreak).asc())
    denom = float(max(n - 1, 1))
    return df.withColumn(out, (F.row_number().over(w) - 1) / F.lit(denom))


def datatailor_select(
    df: DataFrame,
    k: int,
    informativeness_col: str,
    uniqueness_col: str,
    id_col: str,
    inf_weight: float = 1.0 / 3.0,
) -> DataFrame:
    """D7 DataTailorFilter selection (datatailor_filter.py:351-372): rank-
    normalize each metric, combine (informativeness ⅓, uniqueness+
    representativeness ⅔ by default), keep the top-k by combined score."""
    df = df.cache()  # consumed by count + both normalizations + final sort
    n = df.count()  # one count job feeds both normalizations
    r1 = rank_normalize(df, informativeness_col, "_inf_n", tiebreak=id_col, n=n)
    r2 = rank_normalize(r1, uniqueness_col, "_uni_n", tiebreak=id_col, n=n)
    scored = r2.withColumn(
        "score",
        F.round(
            F.col("_inf_n") * inf_weight + F.col("_uni_n") * (1.0 - inf_weight), 6
        ),
    ).drop("_inf_n", "_uni_n")
    return top_k(scored, "score", k, tiebreak=id_col)


def order_nulls_last(df: DataFrame, col: str, ascending: bool = True) -> DataFrame:
    c = F.col(col).asc_nulls_last() if ascending else F.col(col).desc_nulls_last()
    return df.orderBy(c)
