"""Deduplication family — exact, n-gram Jaccard, MinHash+LSH, SimHash.

Reference analogues: ImageDeduplicateFilter's pairwise keep-first semantics
(image_deduplication_filter.py:122-157 — mark j duplicate when sim(i,j) ≥ t
for some i < j), the sequential TF-IDF near-dup state (image_diversity_filter
.py:14-34, streaming variant in streaming/dedup.py), and the ``min_hashes``
storage column stub (utils/storage.py:289-291).

Scale design:
* exact dedup — hash-aggregate on the text (or normalized text): one shuffle,
  map-side combine; at 100TB pre-hash to a 128-bit digest first so the
  shuffle carries 16 bytes, not documents (``exact_dedup_by_digest``).
* MinHash — signatures are computed per-row JVM-side with md5 (deterministic
  AND portable to the DuckDB oracle: lexicographic min over hex digests of
  salted shingles is a valid min-wise hash). LSH banding turns the O(n²)
  all-pairs problem into an equi-join on (band_idx, band_key): candidates
  shuffle only on band buckets, then exact Jaccard verifies. Band keys are
  md5 of the band slice → uniform bucket distribution, skew-safe.
* SimHash — 60-bit signature via md5 word hashes folded per bit (vectorized
  numpy pandas UDF; md5 keeps it portable to the DuckDB oracle); Hamming
  distance via bit_count(a XOR b) JVM-side, candidates from 15-bit chunk
  blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dataflow_mm_spark.functions.normalize import normalize_text

# ------------------------------ exact dedup ---------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per identical text. One shuffle on the digest
    of the text (not the text itself) + a broadcast-free semi-join pattern:
    groupBy(digest).min(id) then join back — Catalyst rewrites this as two
    stages sharing the digest partitioning."""
    digest = F.md5(F.col(text_col))
    keep = (
        df.select(digest.alias("_d"), F.col(id_col))
        .groupBy("_d")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, on=id_col, how="leftsemi")


def dedup_mark(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Non-destructive: add ``is_dup`` (true for every row whose text already
    appeared under a smaller id)."""
    w_min = (
        df.groupBy(F.md5(F.col(text_col)).alias("_d"))
        .agg(F.min(id_col).alias("_keep"))
    )
    return (
        df.withColumn("_d", F.md5(F.col(text_col)))
        .join(w_min, "_d")
        .withColumn("is_dup", F.col(id_col) != F.col("_keep"))
        .drop("_d", "_keep")
    )


# ------------------------- shingles & Jaccard -------------------------------


def norm_words(text: Column) -> Column:
    """Normalized word array (split of normalize_text). ALWAYS pre-project
    this into a named column before building shingles from it: an expression
    subtree referenced inside a higher-order-function lambda is re-evaluated
    per array element (measured: 50x on shingle-heavy corpora), a column
    reference is a leaf."""
    return F.split(normalize_text(text), " ")


def shingles_of_words(words: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a (pre-projected) words column."""
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(n)]
        ),
    )
    # sequence(1, 0) is invalid; guard short texts by emitting the whole text
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Convenience wrapper — fine for one-shot use; hot paths should
    pre-project norm_words() first (see ngram_jaccard_pairs)."""
    return shingles_of_words(norm_words(text), n)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate generation by shared shingle (inverted-index join — never
    all-pairs), then exact Jaccard ≥ threshold over the FULL shingle sets.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``max_df`` drops shingles occurring in more than that many documents from
    *candidate generation only* (stop-shingle cap — without it a low-entropy
    corpus degenerates the inverted join to all-pairs; the verification
    Jaccard still uses every shingle). The DuckDB oracle applies the same cap."""
    # cache: sh feeds candidate generation (2x), df-cap, and verification
    # (2x) — without it every consumer rescans + recomputes the shingle
    # expression (InferFiltersFromGenerate additionally inlines it into a
    # per-scan filter; measured 10x recompute). At warehouse scale this
    # materializes as an intermediate table instead.
    sh = (
        df.select(F.col(id_col).alias("_id"), norm_words(F.col(text_col)).alias("_w"))
        .select("_id", shingles_of_words(F.col("_w"), n).alias("_sh"))
        .cache()
    )
    inv = sh.select("_id", F.explode("_sh").alias("_g"))
    if max_df is not None:
        dfreq = inv.groupBy("_g").agg(F.count("*").alias("_df"))
        inv = inv.join(dfreq.filter(F.col("_df") <= max_df).select("_g"), "_g")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb")), "id_b")
        .withColumn("_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_common")
            / (F.size("_sa") + F.size("_sb") - F.col("_common")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Keep-first near-dedup: drop rows having a ≥-threshold neighbor with a
    smaller id (reference D1 pairwise semantics)."""
    dups = ngram_jaccard_pairs(df, text_col, id_col, n, threshold).select(
        F.col("id_b").alias(id_col)
    ).distinct()
    return df.join(dups, on=id_col, how="left_anti")


# ------------------------------ MinHash + LSH --------------------------------


def minhash_of_shingles(sh: Column, num_hashes: int = 16) -> Column:
    """array<string> of ``num_hashes`` min-wise hex digests from a
    (pre-projected) shingle column. Hash family i = md5(i || ':' || shingle);
    min is lexicographic over hex — portable across Spark and DuckDB for
    oracle parity."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda g: F.md5(F.concat(i.cast("string"), F.lit(":"), g)))
        ),
    )


def minhash_signature(text: Column, num_hashes: int = 16, n: int = 3) -> Column:
    """Convenience wrapper; hot paths should pre-project shingles first
    (the sh subtree is re-evaluated once per hash family otherwise)."""
    return minhash_of_shingles(word_shingles(text, n), num_hashes)


def minhash_band_keys(sig: Column, bands: int = 4, rows: int = 4) -> Column:
    """array<struct<band:int, key:string>> — md5 of each band's slice."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(F.concat_ws("|", F.slice(sig, b * rows + 1, rows))).alias("key"),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """LSH candidates (same key in ≥1 band) verified by exact shingle
    Jaccard ≥ threshold. Returns (id_a, id_b, jaccard), id_a < id_b."""
    rows = num_hashes // bands
    base = (
        df.select(
            F.col(id_col).alias("_id"), norm_words(F.col(text_col)).alias("_w")
        )
        .select("_id", shingles_of_words(F.col("_w"), n).alias("_sh"))
        .select("_id", "_sh", minhash_of_shingles(F.col("_sh"), num_hashes).alias("_sig"))
        .select("_id", "_sh", minhash_band_keys(F.col("_sig"), bands, rows).alias("_bk"))
        .cache()  # consumed by both sides of the bucket self-join
    )
    buck = base.select("_id", "_sh", F.explode("_bk").alias("b")).select(
        "_id", "_sh", F.col("b.band").alias("_band"), F.col("b.key").alias("_key")
    )
    cand = (
        buck.alias("a")
        .join(
            buck.alias("b"),
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("_sa"),
            F.col("b._sh").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("_sa", "_sb")) / F.size(
        F.array_union("_sa", "_sb")
    )
    # filter on the UNROUNDED ratio, round only for output — the DuckDB
    # oracle (DOCS_MINHASH_LSH_SQL) and ngram_jaccard_pairs both threshold
    # unrounded; thresholding the rounded value here would keep a pair whose
    # Jaccard lies in [threshold-5e-7, threshold) that the oracle drops
    return (
        cand.withColumn("_j", jac)
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    dups = (
        minhash_lsh_pairs(df, text_col, id_col, **kw)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(dups, on=id_col, how="left_anti")


def joint_neardup_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    max_hamming: int = 3,
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """ImageDiversityFilter composition (D4, image_diversity_filter.py:65-120):
    a row survives only if it is novel under BOTH detectors — here n-gram
    Jaccard (content overlap) and SimHash (fuzzy token profile). Keep-first:
    drop ids appearing as the later element of any pair from either detector."""
    jac_dups = ngram_jaccard_pairs(df, text_col, id_col, n, jaccard_threshold, max_df)
    sim_dups = simhash_neardup_pairs(df, text_col, id_col, max_hamming)
    dups = (
        jac_dups.select(F.col("id_b").alias(id_col))
        .unionByName(sim_dups.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    return df.join(dups, on=id_col, how="left_anti")


# --------------------------- MLlib LSH variant -------------------------------


def mllib_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hash_tables: int = 8,
    max_distance: float = 0.5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """Stock Spark ML path: shingles → HashingTF sparse vectors → MinHashLSH
    ``approxSimilarityJoin`` (distance = 1 - Jaccard estimate). Returns
    (id_a, id_b, jaccard_est) with id_a < id_b. Complements the portable
    md5 MinHash (minhash_lsh_pairs) — this variant rides MLlib's native
    banding/bucketing and is the drop-in for warehouse-scale runs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = (
        df.select(F.col(id_col).alias("_id"), norm_words(F.col(text_col)).alias("_w"))
        .select("_id", shingles_of_words(F.col("_w"), n).alias("_sh"))
    )
    tf = HashingTF(inputCol="_sh", outputCol="features", numFeatures=num_features)
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=seed,
    ).fit(feats)
    joined = lsh.approxSimilarityJoin(feats, feats, max_distance, distCol="dist")
    return (
        joined.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.round(1 - F.col("dist"), 6).alias("jaccard_est"),
        )
    )


# -------------------------------- SimHash ------------------------------------


SIMHASH_BITS = 60  # 15 hex chars of md5 — positive in int64 AND portable to
#                    the DuckDB oracle (CAST('0x'||substr(md5(t),1,15) AS BIGINT))


@pandas_udf(T.LongType())
def simhash_sig(texts: pd.Series) -> pd.Series:
    """60-bit SimHash over distinct unigram tokens of the normalized
    (punctuation stripped, lowercased) text. Token hash = first 15 hex chars
    of md5 — the DuckDB oracle recomputes the identical signature in SQL.
    Vectorized numpy fold per document."""
    import hashlib
    import string as _string

    table = str.maketrans("", "", _string.punctuation)
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)

    def sh(t: str | None) -> int:
        if not t:
            return 0
        toks = t.translate(table).lower().split()
        if not toks:
            return 0
        hs = np.array(
            [int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) for tok in set(toks)],
            dtype=np.int64,
        )
        bits = (hs[:, None] >> shifts) & 1
        v = (bits.sum(0) * 2 >= len(hs)).astype(np.int64)
        return int((v << shifts).sum())

    return texts.map(sh).astype("int64")


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Block on 4 x 15-bit chunks (a pair within Hamming ≤ 3 must agree on at
    least one chunk — pigeonhole), verify with bit_count(a XOR b)."""
    sig = df.select(F.col(id_col).alias("_id"), simhash_sig(F.col(text_col)).alias("_s"))
    chunks = sig.select(
        "_id",
        "_s",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("c"),
                        F.shiftright("_s", 15 * i).bitwiseAND(F.lit(0x7FFF)).alias("k"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("ck"),
    ).select("_id", "_s", F.col("ck.c").alias("_c"), F.col("ck.k").alias("_k"))
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a._c") == F.col("b._c"))
            & (F.col("a._k") == F.col("b._k"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._s").alias("_sa"),
            F.col("b._s").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
