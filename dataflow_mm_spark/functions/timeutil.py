"""Event-time helpers.

``epoch_seconds`` gives fractional epoch seconds for TIMESTAMP and
TIMESTAMP_NTZ columns alike, computed as a wall-clock NTZ difference from the
epoch. NOT ``unix_micros(cast(ts as timestamp))``: that interprets the value
in the session timezone, and in a non-UTC session two events straddling a DST
transition come out 3600s apart from their wall-clock difference (verified:
23h instead of 24h in America/Los_Angeles) — silently shifting session-gap
and CEP-latency decisions. The NTZ diff is timezone-free and matches DuckDB's
naive ``epoch()`` in any session.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_seconds(c: Column) -> Column:
    return (
        F.timestamp_diff(
            "MICROSECOND", F.expr(_EPOCH_NTZ), c.cast("timestamp_ntz")
        )
        / F.lit(1_000_000.0)
    )


def epoch_micros(c: Column) -> Column:
    """Integer wall-clock microseconds since epoch via the same NTZ diff —
    the DST-safe long form used to ship event time across Arrow as 8 raw
    bytes (identical to pandas' naive datetime64[us].astype(int64))."""
    return F.timestamp_diff(
        "MICROSECOND", F.expr(_EPOCH_NTZ), c.cast("timestamp_ntz")
    )
