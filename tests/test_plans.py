"""Plan hygiene: predicate pushdown, column pruning, codegen, broadcast —
the physical plans must be the ones we'd want at 100 TB."""

from __future__ import annotations

from dataflow_mm_spark.plans import registry as R

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(R.q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 6 needed columns — no full-width scan
    assert "l_orderkey" not in plan and "l_partkey" not in plan
    # map-side combine before the single shuffle
    assert "partial_sum" in plan and plan.count("Exchange") == 1


def test_top_customers_broadcasts_dim(spark):
    plan = _plan(R.top_customers_by_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_quality_filter_scan_prunes_columns(spark):
    plan = _plan(R.docs_quality_filter(spark, SF))
    # only doc_id + text are read
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "EvalPython" not in plan  # zero Python in the 15-rule hot path


def test_events_window_partial_agg(spark):
    plan = _plan(R.events_tumbling_hourly(spark, SF))
    # map-side combine before the shuffle (partial_count/partial_avg)
    assert "partial_" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") <= 2


def test_minhash_signatures_no_python(spark):
    plan = _plan(R.docs_minhash_signatures(spark, SF))
    assert "EvalPython" not in plan
