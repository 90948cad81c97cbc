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
anything beyond a gap waits for the missing turn. At close (watermark passes
last activity + gap) the pending buffer is FLUSHED through the FSM in
ascending turn order (gap-skip) so detections among buffered turns match the
batch oracle, the open tool call resolves unpaired (close defines the
effective pairing latency — batch analogue: tool_pairing(max_latency_sec=
close_gap)), and the state collapses to a small TOMBSTONE {next_idx,
last_ua_role} retained for RETENTION_GAPS x the gap: a conversation that RESUMES after a
close continues its FSM (cross-gap role alternation stays batch-exact)
instead of restarting at turn 0 and wedging. A stale duplicate of an
already-consumed turn_idx is dropped on arrival. State is a flat struct
(Python state API limitation, SURVEY.md §7.7) with the pending buffer
JSON-encoded.

Skew note: state is keyed by conv_id, so a mega-conversation lands on one
task — state size is bounded by the pending buffer (gap-bounded), not by
conversation length, because the FSM discards consumed turns.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# tombstone retention: a closed conversation's {next_idx, last_ua_role} stub
# survives this many close-gaps past its last activity before full removal.
# A resume AFTER retention degrades gracefully (the close-time flush emits
# its detections from a fresh FSM; only cross-boundary lag context is lost).
# Tombstones ride the state between batches, but a sweep drops any whose
# retention is already behind the watermark — so large watermark jumps
# (big micro-batches) pay nothing for long retention.
RETENTION_GAPS = 4


def _has_call(text):
    """Complete <tool_call>...</tool_call> span — the SAME span definition as
    the batch oracle (operators/cep.py tool_pairing via
    extraction.TOOL_CALL_PATTERN). A bare contains('<tool_call>') would open
    the tool FSM on an unterminated tag where batch would not, breaking the
    documented streaming/batch parity contract on malformed input."""
    from dataflow_mm_spark.functions.extraction import TOOL_CALL_PATTERN

    return text.rlike(TOOL_CALL_PATTERN)

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


def _unpack(st_t) -> list:
    """Flat state tuple → working list with the pending buffer as a dict."""
    return [
        st_t[0], st_t[1], st_t[2], st_t[3], st_t[4],
        {k: tuple(v) for k, v in json.loads(st_t[5] or "{}").items()},
        st_t[6], st_t[7], st_t[8], st_t[9], st_t[10],
    ]


def _pack(st: list) -> tuple:
    return (
        st[0], st[1], st[2], st[3], st[4], json.dumps(st[5]),
        st[6], st[7], st[8], st[9], st[10],
    )


def _cep_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    close_gap_us: int = 0,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]
    wm_ms = state.getCurrentWatermarkMs()
    if state.hasTimedOut:
        st = _unpack(state.get)
        out: list = []
        if st[6] > 0 or st[5]:
            # close with activity: flush pending through the FSM, emit the
            # summary, keep a tombstone so a later resume continues in place
            # (unless its retention is already behind the watermark)
            _conv_close(conv_id, st, out)
            if st[10] + RETENTION_GAPS * close_gap_us < wm_ms * 1000:
                state.remove()
            else:
                state.update(_pack(st))
                state.setTimeoutTimestamp(
                    max(
                        st[10] // 1000 + RETENTION_GAPS * (close_gap_us // 1000),
                        wm_ms + 1000,
                    )
                )
        else:
            # tombstone with no activity since its close: retention expired
            state.remove()
        if out:
            yield pd.DataFrame(
                out, columns=["conv_id", "kind", "turn_idx", "detail", "ts"]
            )
        return

    st = _unpack(state.get) if state.exists else _unpack(_EMPTY)
    out = []
    arrivals = []
    for pdf in pdf_iter:
        for r in pdf.itertuples():
            arrivals.append(
                (
                    int(r.turn_idx),
                    r.role,
                    r.tool if isinstance(r.tool, str) else None,
                    bool(r.has_call),
                    _ts_us(r.ts),
                )
            )
    _conv_step(conv_id, st, arrivals, out)
    state.update(_pack(st))
    # close an ACTIVE conversation when the watermark passes last activity +
    # gap; a TOMBSTONE that received only stale duplicates (all skipped) must
    # keep its RETENTION horizon — mirroring _next_event_us in the bucketed
    # path — else the close-gap timeout removes it after 1 gap and a later
    # resume restarts the FSM at 0. Timeouts are strictly beyond the watermark.
    horizon_us = close_gap_us if (st[6] > 0 or st[5]) else RETENTION_GAPS * close_gap_us
    state.setTimeoutTimestamp(
        max(st[10] // 1000 + horizon_us // 1000, wm_ms + 1000)
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

# per-conv state vector layout (both variants; inside the bucket JSON for
# the bucketed path):
# [next_idx, last_ua_role, open_tool, open_idx, open_ts_us, pending{idx:[...]},
#  n_turns, n_violations, n_paired, n_unpaired, max_ts_us]
# A TOMBSTONE (closed conversation awaiting retention expiry) is the same
# vector with empty pending and zeroed counters — next_idx/last_ua_role
# survive so a resumed conversation continues its FSM batch-exactly.


def _transition(conv_id: str, st: list, idx: int, role, tool, has_call,
                ts_us: int, out: list) -> None:
    """ONE FSM step — the single-source parity target is the batch operator
    pair (operators/cep.py role_violations + tool_pairing)."""
    ts = pd.Timestamp(ts_us, unit="us")
    st[6] += 1  # n_turns
    # resolve an open tool call: the next consumed turn decides pairing
    # (== batch lead() over turn order)
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
    # role alternation over user/assistant turns only (== batch lag())
    if role in ("user", "assistant"):
        if st[1] == role:
            out.append((conv_id, "role_violation", idx, role, ts))
            st[7] += 1
        st[1] = role
    # new tool call opens
    if has_call and role == "assistant" and tool:
        st[2], st[3], st[4] = tool, idx, ts_us
    st[0] = idx + 1


def _conv_step(conv_id: str, st: list, arrivals: list, out: list) -> None:
    """Buffer arrivals, then consume the contiguous prefix.

    The consume loop INLINES _transition: at ~10us/turn total budget the
    call overhead is a measured ~30% at local[8] (537k vs 790k turns/s on
    the 13.7M-turn bench). _transition stays the readable single source for
    the cold close-flush path; the parity tests cover both copies — edit
    them TOGETHER."""
    pending = st[5]
    for turn_idx, role, tool, has_call, ts_us in arrivals:
        if turn_idx < st[0]:
            continue  # stale duplicate of an already-consumed turn
        pending[str(turn_idx)] = (role, tool, has_call, ts_us)
        if ts_us > st[10]:
            st[10] = ts_us
    append = out.append
    while str(st[0]) in pending:
        role, tool, has_call, ts_us = pending.pop(str(st[0]))
        idx = st[0]
        ts = pd.Timestamp(ts_us, unit="us")
        st[6] += 1
        if st[2] is not None:
            if role == "tool" and tool == st[2]:
                append((conv_id, "tool_paired", st[3], st[2], ts))
                st[8] += 1
            else:
                append(
                    (conv_id, "tool_unpaired", st[3], st[2],
                     pd.Timestamp(st[4], unit="us"))
                )
                st[9] += 1
            st[2] = st[3] = st[4] = None
        if role in ("user", "assistant"):
            if st[1] == role:
                append((conv_id, "role_violation", idx, role, ts))
                st[7] += 1
            st[1] = role
        if has_call and role == "assistant" and tool:
            st[2], st[3], st[4] = tool, idx, ts_us
        st[0] = idx + 1


def _conv_close(conv_id: str, st: list, out: list) -> None:
    """Close IN PLACE: flush the pending buffer through the FSM in ascending
    turn order (gap-skip — detections among buffered turns match the batch
    oracle), resolve a still-open tool call as unpaired (the close gap is the
    effective pairing latency), emit the summary, then collapse to a
    tombstone (counters reset; next_idx/last_ua_role kept for resume)."""
    pending = st[5]
    for k in sorted(pending, key=int):
        role, tool, has_call, ts_us = pending.pop(k)
        _transition(conv_id, st, int(k), role, tool, has_call, ts_us, out)
    if st[2] is not None:
        out.append(
            (conv_id, "tool_unpaired", st[3], st[2], pd.Timestamp(st[4], unit="us"))
        )
        st[9] += 1
        st[2] = st[3] = st[4] = None
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
                    "n_pending": 0,  # flushed above
                },
                sort_keys=True,
            ),
            pd.Timestamp(st[10], unit="us"),
        )
    )
    st[6] = st[7] = st[8] = st[9] = 0  # counters restart for a resume epoch


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

    def _sweep(convs: dict, wm_us: int, out: list) -> dict:
        """Close every conversation the watermark has passed (tombstones stay
        until retention expiry); returns the surviving conv map."""
        expired = []
        for cid, st in convs.items():
            active = st[6] > 0 or st[5]
            if active and st[10] + gap_us < wm_us:
                _conv_close(cid, st, out)  # becomes a tombstone in place
                active = False
            # a tombstone whose retention is ALREADY behind the watermark is
            # dropped in the same sweep — when the watermark jumps far past a
            # batch (large micro-batches), closing-then-retaining would
            # serialize every dead conversation for one extra batch
            # (measured ~20% on the 13.7M-turn bench)
            if not active and st[10] + RETENTION_GAPS * gap_us < wm_us:
                expired.append(cid)
        for cid in expired:
            del convs[cid]
        return convs

    def _next_event_us(st: list) -> int:
        # active conv → close at last activity + gap; tombstone → retention
        return st[10] + (gap_us if (st[6] > 0 or st[5]) else RETENTION_GAPS * gap_us)

    def fn(key, pdf_iter, state: GroupState):
        out: list = []
        if state.hasTimedOut:
            convs = json.loads(state.get[0])
            wm_us = state.getCurrentWatermarkMs() * 1000
            remaining = _sweep(convs, wm_us, out)
            if remaining:
                nxt = min(_next_event_us(st) for st in remaining.values()) // 1000
                state.update((json.dumps(remaining), state.get[1]))
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
        convs = _sweep(convs, wm_us, out)

        state.update((json.dumps(convs), bucket_max))
        if convs:
            nxt = min(_next_event_us(st) for st in convs.values()) // 1000
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
