"""MLP regression head (aesthetic-predictor forward pass): numpy math vs a
hand-rolled per-row loop, Spark surface parity, threshold composition, and
the integer-exact deterministic fixture head."""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_mm_spark.functions.mlphead import (
    aesthetic_filter,
    det_head,
    mlp_forward,
    mlp_score,
)


def _loop_forward(x, layers):
    h = np.asarray(x, dtype=np.float64)
    for W, b, act in layers:
        h = np.array([float(np.dot(W[j], h)) + b[j] for j in range(len(b))])
        if act == "relu":
            h = np.maximum(h, 0.0)
    return float(h[0])


def _rand_layers(rng, dims, acts):
    layers = []
    for (i, o), a in zip(zip(dims[:-1], dims[1:]), acts):
        layers.append((rng.normal(size=(o, i)), rng.normal(size=o), a))
    return layers


def test_forward_matches_rowwise_loop():
    rng = np.random.default_rng(2)
    layers = _rand_layers(rng, [6, 5, 3, 1], ["relu", "relu", None])
    X = rng.normal(size=(17, 6))
    got = mlp_forward(X, layers)
    want = [_loop_forward(x, layers) for x in X]
    assert np.allclose(got, want)


def test_reference_shape_is_affine_at_eval():
    # the reference head is Linear-only at eval (Dropout = identity):
    # the chain must equal its composed single affine map
    rng = np.random.default_rng(4)
    layers = _rand_layers(rng, [8, 16, 4, 1], [None, None, None])
    X = rng.normal(size=(9, 8))
    W = np.eye(8)
    b = np.zeros(8)
    for Wl, bl, _ in layers:
        b = Wl @ b + bl
        W = Wl @ W
    assert np.allclose(mlp_forward(X, layers), (X @ W.T + b)[:, 0])


def test_forward_validations():
    with pytest.raises(ValueError):
        mlp_forward(np.zeros((2, 3)), [(np.zeros((2, 3)), np.zeros(2), None)])
    with pytest.raises(ValueError):
        mlp_forward(
            np.zeros((2, 3)), [(np.zeros((1, 3)), np.zeros(1), "tanh")]
        )


def test_mlp_score_spark_parity(spark):
    rng = np.random.default_rng(6)
    layers = _rand_layers(rng, [5, 4, 1], ["relu", None])
    vecs = rng.normal(size=(20, 5))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r.score for r in mlp_score(df, layers=layers).collect()}
    Xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = mlp_forward(Xn, layers)
    for i in range(20):
        assert rows[i] == pytest.approx(want[i], rel=1e-12)
    # no-normalize path
    rows2 = {
        r.vec_id: r.score
        for r in mlp_score(df, layers=layers, l2_normalize=False).collect()
    }
    want2 = mlp_forward(vecs, layers)
    for i in range(20):
        assert rows2[i] == pytest.approx(want2[i], rel=1e-12)


def test_aesthetic_filter_threshold(spark):
    layers = [(np.array([[1.0, 0.0]]), np.array([0.0]), None)]
    df = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [-2.0, 0.0]), (3, [0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    kept = aesthetic_filter(
        df, layers=layers, min_score=0.4, l2_normalize=False
    )
    assert sorted(r.vec_id for r in kept.collect()) == [1, 3]
    assert "aesthetic_score" in kept.columns


def test_det_head_integer_exact():
    layers = det_head(64)
    rng = np.random.default_rng(8)
    q = rng.integers(-1500, 1500, size=(50, 64)).astype(np.float64)
    out = mlp_forward(q, layers)
    assert np.array_equal(out, np.round(out))  # exact integers in float64


def test_mlp_score_null_and_ragged_rows(spark):
    layers = [(np.ones((1, 3)), np.zeros(1), None)]
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r.vec_id: r.score
        for r in mlp_score(df, layers=layers, l2_normalize=False).collect()
    }
    assert rows[1] == pytest.approx(6.0)
    assert rows[2] is None and rows[3] is None  # per-row NULL, no job abort
