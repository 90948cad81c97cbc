"""Pluggable MLP regression head — the aesthetic-predictor forward pass.

The reference scores aesthetics with a CLIP encoder + MLP regression head
(video_aesthetic_evaluator.py:78-97: a Linear 1024→128→64→16→1 chain whose
Dropout layers are identity at eval, applied to L2-normalized image
features; image_aesthetic_filter.py thresholds the score).  The ENCODER is
serving scope (north-rule cut — no torch in this container); the HEAD's
forward pass is pure math and runs here for REAL: the weight list is
broadcast once, and each Arrow batch runs one numpy batched-matmul chain
(n×d @ d×h — JVM→Arrow→BLAS, never per-row python).

Weights are supplied by the user exactly as they would load a checkpoint
(list of (W, b, activation) with W shaped (out_dim, in_dim) like
torch.nn.Linear).  At 100 TB the head is embarrassingly parallel — no
shuffle, no state; the embedding column is the payload and crosses Arrow
once by necessity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Layer = tuple[np.ndarray, np.ndarray, str | None]  # (W (out,in), b (out,), act)


def mlp_forward(X: np.ndarray, layers: list[Layer]) -> np.ndarray:
    """Batched forward pass: X (n, d) float64 → (n,) scores (last layer must
    have out_dim 1).  Activation per layer: None (identity — the reference
    head is a pure Linear chain at eval) or 'relu'."""
    H = np.asarray(X, dtype=np.float64)
    for W, b, act in layers:
        H = H @ np.asarray(W, dtype=np.float64).T + np.asarray(b, dtype=np.float64)
        if act == "relu":
            np.maximum(H, 0.0, out=H)
        elif act is not None:
            raise ValueError(f"unknown activation {act!r}")
    if H.shape[1] != 1:
        raise ValueError("last layer must produce one output")
    return H[:, 0]


def mlp_score(
    df: DataFrame,
    vec_col: str = "embedding",
    layers: list[Layer] | None = None,
    out_col: str = "score",
    l2_normalize: bool = True,
) -> DataFrame:
    """Score every row's embedding with the MLP head.  ``l2_normalize``
    mirrors the reference's ``F.normalize(feats, p=2)`` before the head
    (video_aesthetic_evaluator.py:133); disable it when the input is
    pre-quantized for cross-engine-exact gates."""
    if not layers:
        raise ValueError("layers required — supply the checkpoint weights")
    spark = df.sparkSession
    frozen = [
        (
            np.asarray(W, dtype=np.float64),
            np.asarray(b, dtype=np.float64),
            act,
        )
        for W, b, act in layers
    ]
    bc = spark.sparkContext.broadcast(frozen)

    in_dim = frozen[0][0].shape[1]

    @F.pandas_udf("double")
    def head(vecs: pd.Series) -> pd.Series:
        # NULL / ragged embeddings score NULL per row — one bad row must
        # never abort the Arrow task (per-row contract of the scoring ops)
        arrs, ok_idx = [], []
        for i, v in enumerate(vecs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.ndim == 1 and a.shape[0] == in_dim:
                arrs.append(a)
                ok_idx.append(i)
        out = pd.array([None] * len(vecs), dtype="Float64")
        if arrs:
            X = np.stack(arrs)
            if l2_normalize:
                n = np.linalg.norm(X, axis=1, keepdims=True)
                X = X / np.where(n == 0, 1.0, n)
            scores = mlp_forward(X, bc.value)
            for j, i in enumerate(ok_idx):
                out[i] = scores[j]
        return pd.Series(out, dtype="Float64")

    return df.withColumn(out_col, head(F.col(vec_col)))


def aesthetic_filter(
    df: DataFrame,
    vec_col: str = "embedding",
    layers: list[Layer] | None = None,
    min_score: float = 0.0,
    score_col: str = "aesthetic_score",
    l2_normalize: bool = True,
) -> DataFrame:
    """ImageAestheticFilter (F3) composition: MLP head score → threshold
    filter (image_aesthetic_filter.py pattern: score then keep rows with
    score ≥ min_score)."""
    scored = mlp_score(
        df, vec_col, layers, out_col=score_col, l2_normalize=l2_normalize
    )
    return scored.filter(F.col(score_col) >= min_score)


def det_head(
    in_dim: int, hidden: int = 8, seed: int = 3
) -> list[Layer]:
    """Deterministic small-integer head for fixtures/oracles: integer-valued
    float64 weights make the whole forward pass EXACT in any engine
    (integer-valued double arithmetic has no summation-order ambiguity below
    2^53).  W1[j,i] = (7i + 13j + seed) % 5 − 2, b1[j] = j % 3 − 1 (ReLU);
    W2[0,j] = (11j) % 7 − 3, b2 = 5."""
    W1 = np.fromfunction(
        lambda j, i: (7 * i + 13 * j + seed) % 5 - 2, (hidden, in_dim)
    ).astype(np.float64)
    b1 = (np.arange(hidden) % 3 - 1).astype(np.float64)
    W2 = ((11 * np.arange(hidden)) % 7 - 3).astype(np.float64).reshape(1, hidden)
    b2 = np.array([5.0])
    return [(W1, b1, "relu"), (W2, b2, None)]
