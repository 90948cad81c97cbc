"""Generator operators — model-call maps (SURVEY.md §2.8, G1-G13).

Every reference generator has one shape: build prompts (column passthrough or
template) → batched concurrent model call → append output column
(prompted_qa_generator.py:44-84). Here the model call is a pluggable
``serving`` callable ``list[str] -> list[str]`` invoked inside
``mapInPandas`` — one client per partition, Arrow-batched, replacing the
reference's driver-side ThreadPoolExecutor(10) HTTP fan-out
(api_llm_serving_request.py:111-160) with executor-parallel batches.

No model is bundled: tests and the sandbox use ``fake_serving`` (a
deterministic echo — the Spark-side plumbing is what's under test); a real
deployment passes e.g. an OpenAI-compatible HTTP client factory.

Template fill (PromptTemplatedQAGenerator, prompts/prompt_template.py:33-56)
is pure Spark ``format_string``.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ServingFn = Callable[[list[str]], list[str]]


def fake_serving(prompts: list[str]) -> list[str]:
    """Deterministic stand-in: answers with a tagged digest of the prompt."""
    return [f"<answer> echo:{len(p)}:{p[:32]} </answer>" for p in prompts]


def build_template_prompt(template: str, mapping: dict[str, str]) -> Column:
    """Named-placeholder template fill, e.g. ``'{a} vs {b}'`` with
    mapping {'a': col_a, 'b': col_b} → format_string (JVM-side)."""
    keys = re.findall(r"\{(\w+)\}", template)
    fmt = re.sub(r"\{\w+\}", "%s", template)
    cols = [F.coalesce(F.col(mapping[k]).cast("string"), F.lit("")) for k in keys]
    return F.format_string(fmt, *cols)


def prompted_generator(
    df: DataFrame,
    serving_factory: Callable[[], ServingFn] | None = None,
    prompt_col: str = "prompt",
    output_col: str = "answer",
    batch_size: int = 32,
    concurrency: int = 8,
    max_retries: int = 3,
    backoff_base: float = 0.25,
) -> DataFrame:
    """G1 PromptedQAGenerator: prompt column → answer column. The serving
    client is constructed once per partition (connection reuse), prompts go
    out in ``batch_size`` groups (reference default 32, batch_wrapper.py:28)
    with up to ``concurrency`` batches IN FLIGHT per partition — the
    executor-side analogue of the reference's driver-side
    ThreadPoolExecutor(max_workers=10) HTTP fan-out
    (api_llm_serving_request.py:111-160). For API-bound serving this is the
    difference between saturating an endpoint and idling executors: total
    concurrency = partitions x ``concurrency``, so size it against the
    endpoint's rate limit. The serving callable must be thread-safe (the
    reference shares one HTTP session across its pool the same way).

    Order is preserved: batch results are gathered in submit order, so
    answers stay aligned with their rows. A failed batch retries with
    exponential backoff (``backoff_base * 2^attempt``) up to ``max_retries``
    times, then raises — failing the Spark task (task-level retry/replay is
    the outer safety net)."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    factory = serving_factory or (lambda: fake_serving)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, {output_col} string"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        serving = factory()

        def call(batch: list[str]) -> list[str]:
            delay = backoff_base
            for attempt in range(max_retries + 1):
                try:
                    out = serving(batch)
                    if len(out) != len(batch):
                        raise ValueError(
                            f"serving returned {len(out)} answers for "
                            f"{len(batch)} prompts"
                        )
                    return out
                except Exception:
                    if attempt == max_retries:
                        raise
                    time.sleep(delay)
                    delay *= 2

        with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
            for pdf in it:
                prompts = pdf[prompt_col].fillna("").tolist()
                batches = [
                    prompts[i : i + batch_size]
                    for i in range(0, len(prompts), batch_size)
                ]
                # pool.map gathers in submit order — ordinal-correct answers
                answers = [a for out in pool.map(call, batches) for a in out]
                pdf = pdf.copy()
                pdf[output_col] = answers
                yield pdf

    return df.mapInPandas(gen, out_schema)


def templated_generator(
    df: DataFrame,
    template: str,
    mapping: dict[str, str],
    serving_factory: Callable[[], ServingFn] | None = None,
    output_col: str = "answer",
    **kw,
) -> DataFrame:
    """G2/G4/G5: template × columns → prompt → answer. The template fill is
    a Catalyst expression; only the model call crosses into Python."""
    with_prompt = df.withColumn("_prompt", build_template_prompt(template, mapping))
    out = prompted_generator(
        with_prompt, serving_factory, prompt_col="_prompt", output_col=output_col, **kw
    )
    return out.drop("_prompt")


def batch_list_generator(
    df: DataFrame,
    prompts_col: str = "prompts",
    serving_factory: Callable[[], ServingFn] | None = None,
    output_col: str = "answers",
    **kw,
) -> DataFrame:
    """G6 BatchVQAGenerator: one row holds N prompts → N answers, order
    preserved: posexplode → generator → re-collect_list by ordinal."""
    key = "_blg_id"
    # monotonically_increasing_id is NON-deterministic (partition-dependent):
    # the two consumers of `keyed` (explode branch + final join) must observe
    # ONE materialized assignment, not recompute it independently — an AQE
    # re-plan or upstream shuffle would silently attach answers to the wrong
    # rows. cache() is NOT enough here: cached blocks are best-effort, and an
    # evicted/lost block is recomputed with a possibly different id layout.
    # localCheckpoint TRUNCATES lineage — recomputation is impossible, so a
    # lost block fails the job instead of silently mis-joining answers.
    # (A content hash is no substitute: duplicate rows must keep distinct keys.)
    keyed = df.withColumn(key, F.monotonically_increasing_id()).localCheckpoint()
    exploded = keyed.select(key, F.posexplode(prompts_col).alias("_pos", "_prompt"))
    answered = prompted_generator(
        exploded, serving_factory, prompt_col="_prompt", output_col="_ans", **kw
    )
    collected = answered.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_ans"))),
            lambda s: s["_ans"],
        ).alias(output_col)
    )
    return keyed.join(collected, key).drop(key)


def rollout_and_judge(
    df: DataFrame,
    question_col: str,
    gold_col: str,
    rollout_factory: Callable[[], ServingFn] | None = None,
    judge_factory: Callable[[], ServingFn] | None = None,
    keep: str = "failed",
) -> DataFrame:
    """F13/F14 Vision-dependent / fail-rate filter shape: stage 1 rolls out
    an answer, stage 2 judges it A/B/C against gold
    (vision_dependent_filter.py:46-138, opencompass_verifier prompt), keep
    rows judged failed (hard examples) or passed."""
    rolled = prompted_generator(
        df, rollout_factory, prompt_col=question_col, output_col="_rollout"
    )
    judge_in = rolled.withColumn(
        "_judge_prompt",
        F.concat_ws(
            "\n", F.lit("Judge A/B/C:"), F.col(question_col), F.col(gold_col), F.col("_rollout")
        ),
    )
    judged = prompted_generator(
        judge_in, judge_factory, prompt_col="_judge_prompt", output_col="_judgment"
    ).drop("_judge_prompt")
    grade = F.upper(F.regexp_extract("_judgment", r"\b([ABC])\b", 1))
    failed = grade != "A"
    cond = failed if keep == "failed" else ~failed
    return judged.withColumn("_grade", grade).filter(cond)
