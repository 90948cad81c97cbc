from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflow_mm_spark.functions import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def _topk_oracle(ids, m, qid, k=5):
    q = m[ids == qid][0]
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    cand = [(float(s), int(i)) for s, i in zip(sims, ids) if i != qid]
    cand.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in cand[:k]]


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, m = emb_np
    got = S.cosine_topk(emb, k=5, max_queries=5).collect()
    by_q: dict[int, list[tuple[int, int]]] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid in range(5):
        want = _topk_oracle(ids, m, qid, 5)
        have = [n for _, n in sorted(by_q[qid])]
        assert have == want, (qid, have, want)


def test_ann_lsh_recall(spark, emb, emb_np):
    ids, m = emb_np
    got = S.ann_lsh_topk(emb, k=5, max_queries=10).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for qid in range(10):
        want = set(_topk_oracle(ids, m, qid, 5))
        hits += len(by_q.get(qid, set()) & want)
        total += len(want)
    assert hits / total >= 0.7, f"recall {hits/total}"


def test_ann_ivf_recall(spark, emb, emb_np):
    ids, m = emb_np
    got = S.ann_ivf_topk(emb, k=5, n_cells=8, n_probe=4, max_queries=10).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for qid in range(10):
        want = set(_topk_oracle(ids, m, qid, 5))
        hits += len(by_q.get(qid, set()) & want)
        total += len(want)
    assert hits / total >= 0.5, f"recall {hits/total}"


def test_cosine_neardup_pairs_symmetric_bound(spark, emb):
    sub = emb.filter(F.col("vec_id") < 60)
    pairs = S.cosine_neardup_pairs(sub, threshold=0.9).collect()
    for r in pairs:
        assert r.id_a < r.id_b and r.sim >= 0.9


def test_knn_avg_similarity_keep_ratio(spark, emb):
    sub = emb.filter(F.col("vec_id") < 100)
    kept = S.knn_avg_similarity(sub, k=5, keep_ratio=0.5)
    n = kept.count()
    assert 40 <= n <= 60
    assert set(kept.columns) >= {"vec_id", "embedding", "knn_similarity_score"}


def test_broadcast_matrix_bound_enforced(spark, emb):
    import pytest

    with pytest.raises(ValueError, match="ann_lsh_topk"):
        S._broadcast_matrix(emb, "vec_id", "embedding", max_rows=10)
    # and the public paths inherit the guard
    with pytest.raises(ValueError, match="ann_"):
        S.knn_avg_sim(emb, k=3, max_rows=10).count()


def test_no_cartesian_or_global_window_in_knn_plan(spark, emb):
    """Plan hygiene: the knn keep-ratio path must contain neither a cartesian
    product nor a single-partition global window sort."""
    sub = emb.filter(F.col("vec_id") < 50)
    plan = S.knn_avg_similarity(sub, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
