"""Streaming size-capped session merge — the W6 merge mode as a stateful
streaming operator (reference semantics:
audio_timestamp_chunk_row_generator.py:29-55 merge mode).

Per key (``conv_id``), timestamped spans (span_start/span_end seconds within
the conversation, ``ts`` event time) are buffered in state; when the
watermark passes the key's last activity + ``close_gap`` the buffered spans
are sorted and run through the SAME greedy size-capped merge loop as the
batch operator (operators/expansion.greedy_merge_spans — single source), and
one row per merged sequence is emitted. Emission happens only at close
because the cut rule is cumulative over the per-key span ORDER: a span
arriving out of order before the close can change every sequence after it,
so incremental emission under append mode would be wrong — exactly the same
reasoning as Spark's own session_window finalization.

State size is bounded by spans-per-conversation (the session being merged),
not stream length — the same bound Spark's native session aggregation
carries. Skew: one mega-conversation lands on one task; mitigations are the
same as for windows (see BENCH.md skew section).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dataflow_mm_spark.operators.expansion import greedy_merge_spans
from dataflow_mm_spark.streaming.cep import _parse_gap_us

MERGE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("sequence_num", T.IntegerType(), False),
        T.StructField("merged_start", T.DoubleType(), False),
        T.StructField("merged_end", T.DoubleType(), False),
        T.StructField("n_spans", T.IntegerType(), False),
    ]
)

MERGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("spans_json", T.StringType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)

_COLS = ["conv_id", "sequence_num", "merged_start", "merged_end", "n_spans"]


def merge_spans_stream(
    spans: DataFrame,
    close_gap: str = "30 minutes",
    max_duration: float = 30.0,
) -> DataFrame:
    """spans (streaming, watermarked on ts, columns conv_id/span_start/
    span_end/ts) → one row per merged sequence, emitted when the watermark
    closes the conversation. Output matches
    ``operators.expansion.merge_spans_capped`` on the same input rows
    (parity-tested in tests/test_streaming.py)."""
    gap_us = _parse_gap_us(close_gap)

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            pairs = json.loads(state.get[0])
            state.remove()
            rows = [
                (key[0], seq, s, e, n)
                for seq, s, e, n in greedy_merge_spans(pairs, max_duration)
            ]
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)
            return
        pairs = json.loads(state.get[0]) if state.exists else []
        max_ts_us = state.get[1] if state.exists else 0
        for pdf in pdf_iter:
            ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            pairs += [
                [float(s), float(e)]
                for s, e in zip(pdf["span_start"], pdf["span_end"])
            ]
            if len(ts_us):
                m = int(ts_us.max())
                if m > max_ts_us:
                    max_ts_us = m
        state.update((json.dumps(pairs), max_ts_us))
        state.setTimeoutTimestamp(
            max(
                max_ts_us // 1000 + gap_us // 1000,
                state.getCurrentWatermarkMs() + 1000,
            )
        )

    return (
        spans.select("conv_id", "span_start", "span_end", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=MERGE_OUTPUT_SCHEMA,
            stateStructType=MERGE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
