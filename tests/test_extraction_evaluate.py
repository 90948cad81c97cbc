from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from dataflow_mm_spark.functions import extraction as X
from dataflow_mm_spark.functions.evaluate import with_reward
from dataflow_mm_spark.oracles import evaluate_oracle as O


def test_extract_answer_and_tool_calls(spark, tiny_transcripts):
    df = tiny_transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        "tool",
        X.extract_answer(F.col("text")).alias("ans"),
        X.extract_tool_call_names(F.col("text")).alias("tools"),
        X.extract_tool_result(F.col("text")).alias("tres"),
    )
    rows = df.collect()
    n_ans = sum(1 for r in rows if r.ans != "")
    n_tool = sum(1 for r in rows if len(r.tools) > 0)
    assert n_ans > 0 and n_tool > 0
    for r in rows:
        if r.tools:
            # extracted tool name must agree with the typed tool column
            assert r.tools == [r.tool], r
        if r.tres:
            assert r.tres.startswith(r.tool)
    # oracle parity on extraction
    import re

    for r in rows:
        m = re.search(r"(?s)<answer>\s*(.*?)\s*</answer>", r.text)
        assert r.ans == ((m.group(1).strip()) if m else "")


def test_parse_qa_blocks(spark):
    text = (
        "Some context paragraph about rivers.\n"
        "Q: what is a river?\nA: flowing water.\n"
        "Q: where does it end?\nA: the sea.\n"
        "Q: unpaired question"
    )
    df = spark.createDataFrame([(text,), ("no qa here",)], "t string")
    rows = df.select(X.parse_qa_blocks(F.col("t")).alias("p")).collect()
    p = rows[0].p
    assert p.context == "Some context paragraph about rivers."
    assert [(q.question, q.answer) for q in p.qas] == [
        ("what is a river?", "flowing water."),
        ("where does it end?", "the sea."),
    ]
    assert rows[1].p.qas == [] and rows[1].p.context == "no qa here"


def test_reward_parity(spark):
    cases = [
        ("<answer>A</answer>", "<answer>A</answer>", "multiple choice"),
        ("<answer>A</answer>", "<answer> B </answer>", "multiple choice"),
        ("<answer>1,234</answer>", "<answer>1234.00</answer>", "numerical"),
        ("<answer>1,234.5</answer>", "<answer>1234.5</answer>", "numerical"),
        ("<answer>12</answer>", "<answer>12</answer>", "numerical"),
        ("<answer>12</answer>", "<answer>12.0</answer>", "numerical"),
        ("<answer>abc</answer>", "<answer>12</answer>", "numerical"),
        ("<answer>the cat sat</answer>", "<answer>the cat sat</answer>", "OCR"),
        ("<answer>the cat sat</answer>", "<answer>the dog sat</answer>", "OCR"),
        ("<answer>the cat sat</answer>", "<answer></answer>", "OCR"),
        ("<answer>a quick brown fox</answer>", "<answer>a slow brown fox jumps</answer>", "free-form"),
        ("<answer>hello world</answer>", "<answer>hello world</answer>", "free-form"),
        ("<answer>100</answer>", "<answer>90</answer>", "regression"),
        ("<answer>100</answer>", "<answer>500</answer>", "regression"),
        ("no tags here", "<answer>1</answer>", "multiple choice"),
        ("<answer>x</answer>", "<answer>x</answer>", "unknown-type"),
    ]
    pdf = pd.DataFrame(cases, columns=["gt_solution", "model_output", "question_type"])
    sdf = with_reward(spark.createDataFrame(pdf))
    got = [r.reward for r in sdf.orderBy(F.monotonically_increasing_id()).collect()]
    want = [O.reward(g, o, q) for g, o, q in cases]
    assert all(math.isclose(a, b, abs_tol=1e-9) for a, b in zip(got, want)), list(
        zip(got, want)
    )


def test_metric_kernels_match_independent_oracle():
    """Engine metric kernels (functions/evaluate.py) vs the independent
    reference implementations (oracles/metric_oracle.py — full-matrix DP,
    separate-P/R n-gram counting, literal BLEU formula) over the driver-gate
    fixture families AND 200 randomized word sequences. This is the guard the
    widened constant oracles stand on."""
    import random

    from dataflow_mm_spark.functions import evaluate as E
    from dataflow_mm_spark.oracles import metric_oracle as MO
    from dataflow_mm_spark.plans.registry import _BLEU_PAIRS, _FF_PAIRS, _OCR_PAIRS

    for r, h in _OCR_PAIRS:
        assert math.isclose(
            max(0.0, min(1.0, 1 - E._wer(r, h))), MO.ocr_reward(r, h), abs_tol=1e-12
        ), (r, h)
    for r, h in _FF_PAIRS:
        assert math.isclose(E.rouge_mean(r, h), MO.rouge_mean(r, h), abs_tol=1e-12), (r, h)
    for r, h in _BLEU_PAIRS:
        assert math.isclose(E.bleu(r, h), MO.bleu_method1(r, h), abs_tol=1e-12), (r, h)

    rng = random.Random(17)
    vocab = ["a", "b", "c", "dd", "e9", "naïve", "x", ""]
    for _ in range(200):
        r = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
        h = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
        assert math.isclose(E._wer(r, h), MO.wer(r, h), abs_tol=1e-12), (r, h)
        assert math.isclose(E.rouge_mean(r, h), MO.rouge_mean(r, h), abs_tol=1e-12), (r, h)
        assert math.isclose(E.bleu(r, h), MO.bleu_method1(r, h), abs_tol=1e-12), (r, h)


def test_corpus_mean_reward(spark):
    pdf = pd.DataFrame(
        {
            "gt_solution": ["<answer>A</answer>"] * 4,
            "model_output": ["<answer>A</answer>", "<answer>B</answer>"] * 2,
            "question_type": ["multiple choice"] * 4,
        }
    )
    sdf = with_reward(spark.createDataFrame(pdf))
    assert sdf.agg(F.avg("reward").alias("m")).first().m == 0.5
