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


def timecode_to_seconds(tc: Column) -> Column:
    """``[HH:]MM:SS[.mmm]`` → fractional seconds. Pure-Catalyst base-60
    left-fold over the ':'-split parts, so 1/2/3-part forms all work;
    try_cast turns a malformed part into NULL rather than an ANSI error.
    Reference kernel: video_scene_filter.py:71-91 (timecode ⇄ seconds ⇄
    frame index trio, SURVEY §2.11)."""
    return F.aggregate(
        F.split(tc, ":"),
        F.lit(0.0),
        lambda acc, p: acc * 60 + p.try_cast("double"),
    )


def seconds_to_timecode(sec: Column) -> Column:
    """Fractional seconds → ``HH:MM:SS.mmm``. Goes through integer total
    milliseconds first (round, then all-integer div/mod) so formatting is
    exact — no float modulo at the .999/.000 boundaries."""
    ms = F.round(sec * 1000).cast("bigint")
    fmt = F.format_string(
        "%02d:%02d:%02d.%03d",
        F.floor(ms / 3600000).cast("bigint"),
        F.floor((ms % 3600000) / 60000).cast("bigint"),
        F.floor((ms % 60000) / 1000).cast("bigint"),
        ms % 1000,
    )
    # format_string renders a NULL arg as the literal text 'null'
    return F.when(ms.isNotNull(), fmt)


def frame_index(sec: Column, fps: int = 25) -> Column:
    """Fractional seconds → frame ordinal at ``fps``. Integer arithmetic on
    total milliseconds (``floor(ms*fps/1000)``) — immune to the 1-ulp float
    boundary flips that ``floor(sec*fps)`` suffers cross-engine."""
    ms = F.round(sec * 1000).cast("bigint")
    return F.floor(ms * fps / 1000).cast("bigint")
