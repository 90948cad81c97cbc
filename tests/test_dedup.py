from __future__ import annotations

import itertools
import re
import string

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataflow_mm_spark.functions import dedup as D

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river"),
    (1, "the quick brown fox jumps over the lazy dog near the river"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the creek"),  # near dup of 0
    (3, "a completely different sentence about spark structured streaming"),
    (4, "another unrelated line mentioning window functions and joins"),
    (5, "The quick brown fox, jumps over the lazy dog near the river!"),  # dup after normalize
    (6, "short text"),
    (7, "the quick brown fox jumps over the lazy dog near the river today ok"),
]


def _norm(t: str) -> str:
    t = t.translate(str.maketrans("", "", string.punctuation)).lower().strip()
    return re.sub(r"\s+", " ", t)


def _shingles(t: str, n: int = 3) -> set[tuple[str, ...]]:
    w = _norm(t).split(" ")
    if len(w) < n:
        return {tuple(w)}
    return {tuple(w[i : i + n]) for i in range(len(w) - n + 1)}


def _jaccard_pairs_oracle(threshold: float = 0.8, n: int = 3):
    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(CORPUS, 2):
        sa, sb = _shingles(ta, n), _shingles(tb, n)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out.add((min(ia, ib), max(ia, ib)))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(CORPUS, columns=["doc_id", "text"])
    ).cache()


def test_exact_dedup(spark, docs):
    kept = {r.doc_id for r in D.exact_dedup(docs).collect()}
    assert kept == {0, 2, 3, 4, 5, 6, 7}  # 1 is byte-identical to 0
    marked = {r.doc_id: r.is_dup for r in D.dedup_mark(docs).collect()}
    assert marked[1] and not any(marked[i] for i in (0, 2, 3, 4, 5, 6, 7))


def test_ngram_jaccard_pairs_matches_oracle(spark, docs):
    got = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert got == _jaccard_pairs_oracle(threshold=0.5)


def test_ngram_jaccard_dedup_keep_first(spark, docs):
    kept = {r.doc_id for r in D.ngram_jaccard_dedup(docs, threshold=0.5).collect()}
    dropped = {b for _, b in _jaccard_pairs_oracle(0.5)}
    assert kept == {i for i, _ in CORPUS} - dropped


def test_minhash_lsh_pairs_subset_and_recall(spark, docs):
    exact = _jaccard_pairs_oracle(threshold=0.5)
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, threshold=0.5, num_hashes=16, bands=8
        ).collect()
    }
    # verified by exact jaccard → precision 1.0; banding may miss some
    assert got <= exact
    assert len(got) >= max(1, int(0.5 * len(exact)))


def test_minhash_signature_identical_for_normalized_dups(spark, docs):
    sigs = {
        r.doc_id: tuple(r.sig)
        for r in docs.select(
            "doc_id", D.minhash_signature(F.col("text")).alias("sig")
        ).collect()
    }
    assert sigs[0] == sigs[1] == sigs[5]
    assert sigs[0] != sigs[3]


def test_joint_neardup_dedup(spark, docs):
    kept = {r.doc_id for r in D.joint_neardup_dedup(docs, jaccard_threshold=0.5).collect()}
    # 1 and 5 are (near-)identical to 0 under both detectors; 0 survives
    assert 0 in kept and 1 not in kept and 5 not in kept
    assert {3, 4, 6} <= kept


def test_mllib_minhash_pairs(spark, docs):
    got = {
        (r.id_a, r.id_b)
        for r in D.mllib_minhash_pairs(docs, max_distance=0.6).collect()
    }
    # exact duplicates must surface; unrelated docs must not pair
    assert (0, 1) in got and (0, 5) in got
    assert (3, 4) not in got


def test_simhash_neardup(spark, docs):
    pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    ids = {(a, b) for a, b, _ in pairs}
    assert (0, 1) in ids and (0, 5) in ids
    assert all(h == 0 for a, b, h in pairs if (a, b) in {(0, 1), (0, 5), (1, 5)})
    assert (3, 4) not in ids
