"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``dataflow_mm_spark.plans.registry``: every implemented
operator from SURVEY.md §2 is exposed as a named query; SQL-expressible ones
carry a DuckDB oracle with matched column names + rounding.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataflow_mm_spark.plans import registry as R  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return R.entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(R.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(R.ORACLES)
