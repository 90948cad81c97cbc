"""Audio path: real WAV/PCM decode + the VAD timestamp state machine.

The reference's VAD operator (audio_silero_voice_activity_detection_
timestamps_generator.py:29-60) loads audio, runs the Silero model to get a
per-chunk speech probability, and converts probabilities to speech spans
with the public silero-vad timestamp FSM (threshold hysteresis,
min-speech / min-silence durations, span padding, max-speech splitting).
As with CTC alignment (operators/align.py), the MODEL is a pluggable
serving stage; everything around it is pure algorithm and runs here for
REAL:

* ``decode_wav`` — RIFF chunk walk for 16-bit PCM (mono or multi-channel,
  first channel used), numpy view over the data chunk — no librosa;
* ``energy_probs`` — per-window mean |sample| scaled to [0, 1]: the
  deterministic, model-free probability source (classic energy VAD); a
  Silero-style model UDF can supply the probs column instead;
* ``speech_timestamps`` — the silero-vad ``get_speech_timestamps``
  semantics re-expressed: trigger at ``prob ≥ threshold``, tentative close
  at ``prob < threshold - 0.15`` confirmed after ``min_silence``, spans
  shorter than ``min_speech`` dropped, ``speech_pad`` applied with shared
  short-silence splitting, ``max_speech`` splitting at the last confirmed
  silence candidate;
* ``vad_spans`` — the Arrow-batched Spark surface (binary WAV column →
  spans), the W5 scene/session input shape.

All span arithmetic is integer samples — cross-engine exact for the
value-hash gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VAD_SPAN_SCHEMA = (
    "array<struct<span_idx:int,start_sample:bigint,end_sample:bigint,"
    "start_ms:bigint,end_ms:bigint,n_windows:bigint>>"
)


def decode_wav(buf) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE container with 16-bit PCM samples → (mono int16
    array, sample_rate).  Walks chunks (fmt must precede data, per spec);
    multi-channel audio keeps channel 0.  Raises ValueError on non-PCM /
    non-16-bit / malformed containers — per-row error contract upstream."""
    b = bytes(buf or b"")
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, n = 12, len(b)
    sr = channels = bits = fmt = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt ":
            if body + 16 > n:
                raise ValueError("truncated fmt chunk")
            fmt = int.from_bytes(b[body : body + 2], "little")
            channels = int.from_bytes(b[body + 2 : body + 4], "little")
            sr = int.from_bytes(b[body + 4 : body + 8], "little")
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt}, bits={bits}) — 16-bit PCM only"
                )
            end = min(body + size, n)
            if not sr or sr <= 0:
                raise ValueError("bad sample rate in fmt chunk")
            raw = np.frombuffer(b, dtype="<i2", count=(end - body) // 2, offset=body)
            if channels and channels > 1:
                raw = raw[:: channels]  # channel 0
            return np.ascontiguousarray(raw), int(sr)
        # chunks are word-aligned: odd sizes carry a pad byte
        i = body + size + (size & 1)
    raise ValueError("no data chunk")


def energy_probs(samples: np.ndarray, window: int = 512) -> np.ndarray:
    """Per-window speech probability from energy: mean |sample| over each
    full ``window``-sample chunk, scaled by 1/32768 into [0, 1).  The
    model-free stand-in for the Silero probability head — deterministic
    and integer-derived (mean of int16 magnitudes), so gates can replay it
    exactly.  The trailing partial window is dropped (silero feeds fixed
    512-sample chunks)."""
    m = len(samples) // window
    if m == 0:
        return np.zeros(0)
    x = np.abs(samples[: m * window].astype(np.int64)).reshape(m, window)
    return x.mean(axis=1) / 32768.0


def speech_timestamps(
    probs: np.ndarray,
    *,
    window: int = 512,
    sample_rate: int = 16000,
    threshold: float = 0.5,
    min_speech_s: float = 0.25,
    min_silence_s: float = 0.1,
    speech_pad_s: float = 0.03,
    max_speech_s: float = float("inf"),
    audio_len: int | None = None,
) -> list[tuple[int, int]]:
    """The public silero-vad ``get_speech_timestamps`` state machine over a
    probability-per-window sequence → [(start_sample, end_sample)] spans.

    Semantics mirrored: trigger at ``prob ≥ threshold``; once triggered, a
    dip below ``threshold − 0.15`` starts a tentative end that closes the
    span only after ``min_silence_s`` (re-crossing the threshold cancels
    it); closed spans shorter than ``min_speech_s`` are dropped; a span
    reaching ``max_speech_s`` is split at the last silence candidate that
    aged past 98 ms (silero's min_silence_at_max_speech), else cut hard;
    ``speech_pad_s`` extends both edges, splitting short inter-span
    silences evenly.  All arithmetic in integer samples."""
    min_speech = int(min_speech_s * sample_rate)
    min_silence = int(min_silence_s * sample_rate)
    pad = int(speech_pad_s * sample_rate)
    sil_at_max = int(0.098 * sample_rate)
    max_speech = (
        float("inf")
        if max_speech_s == float("inf")
        else int(max_speech_s * sample_rate) - window - 2 * pad
    )
    neg_threshold = max(threshold - 0.15, 0.01)
    n = len(probs)
    total = audio_len if audio_len is not None else n * window

    triggered = False
    start = temp_end = prev_end = next_start = 0
    spans: list[list[int]] = []
    for i in range(n):
        p = probs[i]
        pos = window * i
        if p >= threshold and temp_end:
            temp_end = 0
            if next_start < prev_end:
                next_start = pos
        if p >= threshold and not triggered:
            triggered = True
            start = pos
            continue
        if triggered and pos - start > max_speech:
            if prev_end:
                spans.append([start, prev_end])
                if next_start < prev_end:  # the silence swallowed the rest
                    triggered = False
                else:
                    start = next_start
                prev_end = next_start = temp_end = 0
            else:
                spans.append([start, pos])
                prev_end = next_start = temp_end = 0
                triggered = False
                continue
        if p < neg_threshold and triggered:
            if not temp_end:
                temp_end = pos
            if pos - temp_end > sil_at_max:
                prev_end = temp_end
            if pos - temp_end < min_silence:
                continue
            if temp_end - start > min_speech:
                spans.append([start, temp_end])
            prev_end = next_start = temp_end = 0
            triggered = False
            continue
    if triggered and total - start > min_speech:
        spans.append([start, total])

    # padding with shared-silence splitting (silero tail pass)
    out: list[tuple[int, int]] = []
    for i, (s, e) in enumerate(spans):
        s2 = max(0, s - pad) if i == 0 else s
        e2 = e
        if i + 1 < len(spans):
            silence = spans[i + 1][0] - e
            if silence < 2 * pad:
                e2 = e + silence // 2
                spans[i + 1][0] = max(0, spans[i + 1][0] - silence // 2)
            else:
                e2 = min(total, e + pad)
                spans[i + 1][0] = max(0, spans[i + 1][0] - pad)
        else:
            e2 = min(total, e + pad)
        out.append((s2, e2))
    return out


def vad_row(
    payload, *, window: int = 512, probs=None, **vad_kw
) -> tuple[list[tuple], int, str | None]:
    """One row end-to-end: decode (skipped when a model-supplied ``probs``
    sequence is given) → energy probs → FSM.  Errors land in the per-row
    error field, mirroring the reference's worker contract."""
    if probs is None and "sample_rate" in vad_kw:
        raise TypeError(
            "sample_rate is read from the WAV header; it is only a "
            "parameter of the model-supplied-probs path"
        )
    try:
        if probs is None:
            samples, sr = decode_wav(payload)
            pr = energy_probs(samples, window=window)
            audio_len = len(samples)
        else:
            pr = np.asarray(probs, dtype=np.float64)
            sr = vad_kw.pop("sample_rate", 16000)
            audio_len = len(pr) * window
        spans = speech_timestamps(
            pr,
            window=window,
            sample_rate=sr,
            audio_len=audio_len,
            **vad_kw,
        )
        rows = []
        for i, (s, e) in enumerate(spans):
            rows.append(
                (
                    i,
                    s,
                    e,
                    s * 1000 // sr,
                    e * 1000 // sr,
                    (e - s) // window,
                )
            )
        return rows, sr, None
    except (ValueError, TypeError) as e:
        return [], 0, str(e)


def vad_spans(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("event_id",),
    window: int = 512,
    **vad_kw,
) -> DataFrame:
    """Spark surface: Arrow-batched WAV → VAD spans.  Output: id columns +
    ``spans`` (span_idx, start/end sample, start/end ms, n_windows) +
    ``error``.  The audio payload crosses Arrow once by necessity; project
    other wide columns away first."""
    if "sample_rate" in vad_kw:
        # loud caller-misuse error ONCE, not a per-row TypeError on every
        # row: over WAV payloads the rate comes from each file's header
        raise TypeError(
            "sample_rate is read from each WAV header; it is only a "
            "parameter of the model-supplied-probs path (vad_row(probs=…))"
        )
    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = f"{ids_schema}, spans {VAD_SPAN_SCHEMA}, error string"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            spans_out, errs = [], []
            for payload in pdf[bin_col]:
                rows, _sr, err = vad_row(payload, window=window, **vad_kw)
                spans_out.append(
                    [
                        {
                            "span_idx": r[0],
                            "start_sample": r[1],
                            "end_sample": r[2],
                            "start_ms": r[3],
                            "end_ms": r[4],
                            "n_windows": r[5],
                        }
                        for r in rows
                    ]
                )
                errs.append(err)
            out = pdf[list(id_cols)].copy()
            out["spans"] = spans_out
            out["error"] = errs
            yield out

    return df.mapInPandas(gen, schema)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal 16-bit PCM mono RIFF/WAVE encoder (fixture/round-trip use)."""
    x = np.asarray(samples, dtype="<i2")
    data = x.tobytes()
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data
