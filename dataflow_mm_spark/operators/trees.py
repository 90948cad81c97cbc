"""MCTS rollout-tree chain extraction — MCTSTreeRefiner re-expressed.

Reference: dataflow/operators/core_text/refine/mcts_tree_refiner.py:30-106 —
recursive traversal of a JSON rollout tree extracting two chain kinds:
* "backtrack" chains: a wrong rollout at a node followed by the path to a
  correct terminal (wrong → reconsider → correct);
* "direct" chains: the straight path to a correct terminal.

The per-node recursion has no relational equivalent, so the tree walk runs in
an Arrow-vectorized pandas UDF returning array<string>; the 1→N expansion is
a plain ``explode``; the seeded 10k cap is operators.topk.seeded_sample_cap.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _walk(
    node: dict,
    path: list[str],
    wrongs: list[tuple[int, str]],
    chains: list[str],
    max_chains: int,
) -> None:
    """path = node texts so far; wrongs = (position-in-path, wrong text) for
    wrong rollouts seen along the way."""
    if len(chains) >= max_chains:
        return
    text = node.get("text") or node.get("state") or ""
    cur = [*path, text] if text else list(path)
    here = len(cur)
    my_wrongs = [
        (here, r.get("text", ""))
        for r in (node.get("rollouts") or [])
        if not r.get("correct", True)
    ]
    all_wrongs = wrongs + my_wrongs
    if node.get("is_terminal"):
        if node.get("is_correct", True):
            chains.append(" -> ".join(cur))  # direct-correct chain
            for pos, wtext in all_wrongs:  # wrong → backtrack → correct
                chains.append(
                    " -> ".join([*cur[:pos], f"[wrong: {wtext}]", *cur[pos:]])
                )
        return
    for child in node.get("children") or []:
        _walk(child, cur, all_wrongs, chains, max_chains)


@pandas_udf(T.ArrayType(T.StringType()))
def extract_chains(trees: pd.Series) -> pd.Series:
    def go(tree_json: str | None) -> list[str]:
        if not tree_json:
            return []
        try:
            root = json.loads(tree_json)
        except (ValueError, TypeError):
            return []
        chains: list[str] = []
        _walk(root, [], [], chains, max_chains=64)
        # reference dedups via set() then seeded-samples; set order is not
        # deterministic across runs, so dedup preserving first occurrence
        seen, out = set(), []
        for c in chains:
            if c not in seen:
                seen.add(c)
                out.append(c)
        return out

    return trees.map(go)


def mcts_chain_rows(df: DataFrame, tree_col: str = "tree", out: str = "chain") -> DataFrame:
    """1 tree row → N chain rows."""
    return df.withColumn("_chains", extract_chains(F.col(tree_col))).select(
        *[c for c in df.columns if c != tree_col],
        F.posexplode("_chains").alias(f"{out}_idx", out),
    )
