"""Streaming CEP over conversation turns — applyInPandasWithState.

Detects, per ``conv_id`` in event (turn_idx) order:
* role-alternation violations (same role as previous user/assistant turn);
* tool request→result pairing (assistant turn carrying a <tool_call> span
  must be followed — next turn_idx — by a role='tool' turn with the same
  tool name) → ``tool_paired`` / ``tool_unpaired`` events;
* conversation close via event-time timeout (watermark passes last activity
  + gap) → ``conv_summary`` event with per-conversation counters.

Semantics match the batch forms in operators/cep.py (their outputs are the
replay oracle — tests assert set equality on the detection rows).

Out-of-order handling: arrivals are buffered in state keyed by turn_idx and
the FSM only consumes the contiguous prefix (next_idx, next_idx+1, ...);
anything beyond a gap waits for the missing turn or the timeout flush. State
is a flat struct (Python state API limitation, SURVEY.md §7.7) with the
pending buffer JSON-encoded.

Skew note: state is keyed by conv_id, so a mega-conversation lands on one
task — state size is bounded by the pending buffer (gap-bounded), not by
conversation length, because the FSM discards consumed turns.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _has_call(text):
    """Complete <tool_call>...</tool_call> span — the SAME span definition as
    the batch oracle (operators/cep.py tool_pairing via
    extraction.TOOL_CALL_PATTERN). A bare contains('<tool_call>') would open
    the tool FSM on an unterminated tag where batch would not, breaking the
    documented streaming/batch parity contract on malformed input."""
    from pyspark.sql import functions as F

    from dataflow_mm_spark.functions.extraction import TOOL_CALL_PATTERN

    return text.rlike(TOOL_CALL_PATTERN)


TOOL_CALL_RE = re.compile(r"(?s)<tool_call>(.*?)</tool_call>")

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_idx", T.IntegerType()),
        T.StructField("last_ua_role", T.StringType()),
        T.StructField("open_tool", T.StringType()),
        T.StructField("open_tool_idx", T.IntegerType()),
        T.StructField("open_tool_ts_us", T.LongType()),
        T.StructField("pending_json", T.StringType()),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("n_violations", T.IntegerType()),
        T.StructField("n_paired", T.IntegerType()),
        T.StructField("n_unpaired", T.IntegerType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)

_EMPTY = (0, None, None, None, None, "{}", 0, 0, 0, 0, 0)


def _ts_us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _cep_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    close_gap_us: int = 0,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]
    if state.hasTimedOut:
        (next_idx, _ua, open_tool, open_idx, open_ts, pending_json,
         n_turns, n_viol, n_paired, n_unpaired, max_ts) = state.get
        rows = []
        if open_tool is not None:
            rows.append(
                (conv_id, "tool_unpaired", open_idx, open_tool,
                 pd.Timestamp(open_ts, unit="us"))
            )
            n_unpaired += 1
        rows.append(
            (
                conv_id,
                "conv_summary",
                next_idx,
                json.dumps(
                    {
                        "n_turns": n_turns,
                        "n_violations": n_viol,
                        "n_paired": n_paired,
                        "n_unpaired": n_unpaired,
                        "n_pending": len(json.loads(pending_json or "{}")),
                    },
                    sort_keys=True,
                ),
                pd.Timestamp(max_ts, unit="us"),
            )
        )
        state.remove()
        yield pd.DataFrame(rows, columns=["conv_id", "kind", "turn_idx", "detail", "ts"])
        return

    st = list(state.get) if state.exists else list(_EMPTY)
    pending: dict[str, list] = json.loads(st[5] or "{}")
    out = []

    for pdf in pdf_iter:
        for r in pdf.itertuples():
            ts_us = _ts_us(r.ts)
            pending[str(int(r.turn_idx))] = [
                r.role,
                r.tool if isinstance(r.tool, str) else None,
                bool(r.has_call),
                ts_us,
            ]
            if ts_us > st[10]:
                st[10] = ts_us

    # consume the contiguous prefix
    while str(st[0]) in pending:
        role, tool, has_call, ts_us = pending.pop(str(st[0]))
        idx = st[0]
        ts = pd.Timestamp(ts_us, unit="us")
        st[6] += 1  # n_turns
        # resolve an open tool call: the *next* turn decides pairing
        if st[2] is not None:
            if role == "tool" and tool == st[2]:
                out.append((conv_id, "tool_paired", st[3], st[2], ts))
                st[8] += 1
            else:
                out.append(
                    (conv_id, "tool_unpaired", st[3], st[2],
                     pd.Timestamp(st[4], unit="us"))
                )
                st[9] += 1
            st[2] = st[3] = st[4] = None
        # role alternation over user/assistant turns only
        if role in ("user", "assistant"):
            if st[1] == role:
                out.append((conv_id, "role_violation", idx, role, ts))
                st[7] += 1
            st[1] = role
        # new tool call opens
        if has_call and role == "assistant" and tool:
            st[2], st[3], st[4] = tool, idx, ts_us
        st[0] = idx + 1

    st[5] = json.dumps(pending)
    state.update(tuple(st))
    # close the conversation when the watermark passes last activity + gap;
    # a timeout must be strictly beyond the current watermark
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(
        max(st[10] // 1000 + close_gap_us // 1000, wm_ms + 1000)
    )
    if out:  # skipping the empty frame saves a pandas alloc per quiet key
        yield pd.DataFrame(out, columns=["conv_id", "kind", "turn_idx", "detail", "ts"])


def cep_stream(turns: DataFrame, close_gap: str = "30 minutes") -> DataFrame:
    """turns (streaming, watermarked on ts) → detection event stream."""
    gap_us = _parse_gap_us(close_gap)

    def fn(key, it, state):
        return _cep_fn(key, it, state, close_gap_us=gap_us)

    from pyspark.sql import functions as F

    # has_call computed JVM-side so the text column (the bulk of the bytes)
    # never crosses the Arrow boundary into the Python state function
    return (
        turns.select(
            "conv_id",
            "turn_idx",
            "role",
            _has_call(F.col("text")).alias("has_call"),
            "tool",
            "ts",
        )
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


BUCKET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("convs_json", T.StringType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)

# per-conv state vector layout inside the bucket JSON:
# [next_idx, last_ua_role, open_tool, open_idx, open_ts_us, pending{idx:[...]},
#  n_turns, n_violations, n_paired, n_unpaired, max_ts_us]


def _conv_step(conv_id: str, st: list, arrivals: list, out: list) -> None:
    """Run the per-conversation FSM over new arrivals (same transitions as
    _cep_fn — the single-source parity target is the batch operators)."""
    pending = st[5]
    for turn_idx, role, tool, has_call, ts_us in arrivals:
        pending[str(turn_idx)] = (role, tool, has_call, ts_us)
        if ts_us > st[10]:
            st[10] = ts_us
    while str(st[0]) in pending:
        role, tool, has_call, ts_us = pending.pop(str(st[0]))
        idx = st[0]
        ts = pd.Timestamp(ts_us, unit="us")
        st[6] += 1
        if st[2] is not None:
            if role == "tool" and tool == st[2]:
                out.append((conv_id, "tool_paired", st[3], st[2], ts))
                st[8] += 1
            else:
                out.append(
                    (conv_id, "tool_unpaired", st[3], st[2],
                     pd.Timestamp(st[4], unit="us"))
                )
                st[9] += 1
            st[2] = st[3] = st[4] = None
        if role in ("user", "assistant"):
            if st[1] == role:
                out.append((conv_id, "role_violation", idx, role, ts))
                st[7] += 1
            st[1] = role
        if has_call and role == "assistant" and tool:
            st[2], st[3], st[4] = tool, idx, ts_us
        st[0] = idx + 1


def _conv_close(conv_id: str, st: list, out: list) -> None:
    if st[2] is not None:
        out.append(
            (conv_id, "tool_unpaired", st[3], st[2], pd.Timestamp(st[4], unit="us"))
        )
        st[9] += 1
    out.append(
        (
            conv_id,
            "conv_summary",
            st[0],
            json.dumps(
                {
                    "n_turns": st[6],
                    "n_violations": st[7],
                    "n_paired": st[8],
                    "n_unpaired": st[9],
                    "n_pending": len(st[5]),
                },
                sort_keys=True,
            ),
            pd.Timestamp(st[10], unit="us"),
        )
    )


def cep_stream_bucketed(
    turns: DataFrame, close_gap: str = "30 minutes", buckets: int = 1024
) -> DataFrame:
    """Scale path: the per-group constant of applyInPandasWithState (~10ms —
    measured) dominates when every conversation is its own group. Coarsen the
    state key to hash(conv_id) % buckets and run the per-conversation FSMs
    inside the bucket state (a JSON dict conv_id → state vector). Conversation
    close is swept against the current watermark on every invocation plus an
    event-time timeout for quiet buckets. Output identical to cep_stream
    (same FSM, same batch-operator parity)."""
    from pyspark.sql import functions as F

    gap_us = _parse_gap_us(close_gap)

    def fn(key, pdf_iter, state: GroupState):
        out: list = []
        if state.hasTimedOut:
            convs = json.loads(state.get[0])
            wm_us = state.getCurrentWatermarkMs() * 1000
            remaining = {}
            for cid, st in convs.items():
                if st[10] + gap_us < wm_us:
                    _conv_close(cid, st, out)
                else:
                    remaining[cid] = st
            if remaining:
                nxt = min(st[10] for st in remaining.values()) // 1000 + gap_us // 1000
                state.update((json.dumps(remaining), max(st[10] for st in remaining.values())))
                state.setTimeoutTimestamp(max(nxt, state.getCurrentWatermarkMs() + 1000))
            else:
                state.remove()
            if out:
                yield pd.DataFrame(
                    out, columns=["conv_id", "kind", "turn_idx", "detail", "ts"]
                )
            return

        convs = json.loads(state.get[0]) if state.exists else {}
        bucket_max = state.get[1] if state.exists else 0

        arrivals: dict[str, list] = {}
        for pdf in pdf_iter:
            convs_col = pdf["conv_id"].to_numpy()
            idx_col = pdf["turn_idx"].to_numpy()
            role_col = pdf["role"].to_numpy()
            tool_col = pdf["tool"].to_numpy()
            call_col = pdf["has_call"].to_numpy()
            ts_col = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            for i in range(len(pdf)):
                tool = tool_col[i]
                arrivals.setdefault(convs_col[i], []).append(
                    (
                        int(idx_col[i]),
                        role_col[i],
                        tool if isinstance(tool, str) else None,
                        bool(call_col[i]),
                        int(ts_col[i]),
                    )
                )

        for cid, rows in arrivals.items():
            st = convs.get(cid)
            if st is None:
                st = [0, None, None, None, None, {}, 0, 0, 0, 0, 0]
                convs[cid] = st
            _conv_step(cid, st, rows, out)
            if st[10] > bucket_max:
                bucket_max = st[10]

        # sweep: close conversations the watermark has passed
        wm_us = state.getCurrentWatermarkMs() * 1000
        for cid in [c for c, st in convs.items() if st[10] + gap_us < wm_us]:
            _conv_close(cid, convs.pop(cid), out)

        state.update((json.dumps(convs), bucket_max))
        if convs:
            nxt = min(st[10] for st in convs.values()) // 1000 + gap_us // 1000
        else:
            nxt = bucket_max // 1000 + gap_us // 1000
        state.setTimeoutTimestamp(max(nxt, state.getCurrentWatermarkMs() + 1000))
        if out:
            yield pd.DataFrame(
                out, columns=["conv_id", "kind", "turn_idx", "detail", "ts"]
            )

    return (
        turns.select(
            "conv_id",
            "turn_idx",
            "role",
            _has_call(F.col("text")).alias("has_call"),
            "tool",
            "ts",
            F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).alias("_bucket"),
        )
        .groupBy("_bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=BUCKET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_gap_us(gap: str) -> int:
    n, unit = gap.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[unit]
    return int(n) * mult * 1_000_000
