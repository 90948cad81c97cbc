"""Event-time helpers.

``epoch_seconds`` gives fractional epoch seconds for TIMESTAMP and
TIMESTAMP_NTZ columns alike (Spark 4 forbids a direct NTZ→double cast; an
NTZ→TIMESTAMP cast interprets the value in the session timezone, which this
engine pins to UTC — matching DuckDB's naive ``epoch()``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(c: Column) -> Column:
    return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)
