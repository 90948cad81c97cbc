"""WAV decode round-trip + the VAD timestamp FSM (hand-pinned cases
computed independently from the silero-vad semantics) + Spark surface."""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_mm_spark.operators.audio import (
    decode_wav,
    encode_wav,
    energy_probs,
    speech_timestamps,
    vad_row,
    vad_spans,
)

W = 512  # samples per probability window
SR = 16000


def test_wav_roundtrip_and_rejects():
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32767, size=5000, dtype=np.int16)
    got, sr = decode_wav(encode_wav(x, 22050))
    assert sr == 22050 and np.array_equal(got, x)
    # stereo: hand-build, channel 0 kept
    stereo = np.empty(200, dtype=np.int16)
    stereo[0::2] = np.arange(100)
    stereo[1::2] = -1
    buf = bytearray(encode_wav(stereo, 16000))
    buf[22:24] = (2).to_bytes(2, "little")  # nChannels = 2
    got, _ = decode_wav(bytes(buf))
    assert np.array_equal(got, np.arange(100, dtype=np.int16))
    # extra chunk before data (odd size → pad byte) is walked over
    x2 = np.arange(50, dtype=np.int16)
    w2 = bytearray(encode_wav(x2))
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"
    w3 = bytes(w2[:36]) + extra + bytes(w2[36:])
    got, _ = decode_wav(w3)
    assert np.array_equal(got, x2)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks
    bad = bytearray(encode_wav(x2))
    bad[20:22] = (3).to_bytes(2, "little")  # IEEE float fmt
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError):
        decode_wav(b"notawav")


def test_energy_probs_exact():
    x = np.zeros(W * 2 + 100, dtype=np.int16)
    x[:W] = 3277  # ~0.1 fullscale
    p = energy_probs(x, window=W)
    assert len(p) == 2  # trailing partial window dropped
    assert p[0] == pytest.approx(3277 / 32768.0)
    assert p[1] == 0.0


def _probs(spec):
    out = []
    for val, n in spec:
        out.extend([val] * n)
    return np.asarray(out)


def test_fsm_basic_two_spans_with_padding():
    probs = _probs([(0.0, 1), (0.9, 10), (0.0, 8), (0.9, 10), (0.0, 1)])
    spans = speech_timestamps(probs, window=W, sample_rate=SR)
    assert spans == [(32, 6112), (9248, 15360)]


def test_fsm_min_speech_drop():
    probs = _probs([(0.9, 2), (0.0, 10)])
    assert speech_timestamps(probs, window=W, sample_rate=SR) == []


def test_fsm_hysteresis_keeps_span_open():
    # dips to 0.4 sit between neg_threshold (0.35) and threshold (0.5):
    # the span must stay open through them
    probs = _probs([(0.9, 1), (0.4, 5), (0.9, 2), (0.0, 8)])
    spans = speech_timestamps(probs, window=W, sample_rate=SR)
    assert spans == [(0, 4576)]


def test_fsm_shared_pad_split():
    probs = _probs([(0.9, 10), (0.0, 2), (0.9, 10), (0.0, 4)])
    spans = speech_timestamps(
        probs, window=W, sample_rate=SR,
        min_silence_s=0.02, speech_pad_s=0.04,
    )
    # inter-span silence (1024) < 2*pad (1280) → split evenly at 5632
    assert spans == [(0, 5632), (5632, 11904)]


def test_fsm_max_speech_hard_cut():
    probs = _probs([(0.9, 30)])
    spans = speech_timestamps(
        probs, window=W, sample_rate=SR, max_speech_s=0.5
    )
    # max_speech = 8000 - 512 - 960 = 6528 → hard cuts at windows 13
    # (pos 6656) and 27 (pos 13824); the trailing 1024-sample fragment is
    # dropped (< min_speech); the 512-sample seam is pad-shared at 6912
    assert spans == [(0, 6912), (6912, 14304)]


def test_vad_row_end_to_end_and_errors():
    # loud block (windows 1-10), silence, loud block (19-28)
    x = np.zeros(W * 30, dtype=np.int16)
    x[W * 1 : W * 11] = 20000
    x[W * 19 : W * 29] = 20000
    rows, sr, err = vad_row(encode_wav(x), window=W)
    assert err is None and sr == SR
    assert [(r[1], r[2]) for r in rows] == [(32, 6112), (9248, 15360)]
    assert rows[0][0] == 0 and rows[1][0] == 1
    assert rows[0][3] == 32 * 1000 // SR and rows[1][4] == 15360 * 1000 // SR
    rows, _, err = vad_row(b"garbage")
    assert rows == [] and err
    # model-supplied probs path (no payload decode)
    probs = _probs([(0.0, 1), (0.9, 10), (0.0, 8), (0.9, 10), (0.0, 1)])
    rows, _, err = vad_row(None, window=W, probs=probs)
    assert err is None
    assert [(r[1], r[2]) for r in rows] == [(32, 6112), (9248, 15360)]


def test_vad_spans_spark(spark):
    payloads = []
    for k in range(6):
        x = np.zeros(W * (20 + k), dtype=np.int16)
        x[W * 2 : W * (8 + k)] = 20000 + 100 * k
        payloads.append((k, encode_wav(x)))
    payloads.append((9, b"not audio at all, but long enough to try"))
    df = spark.createDataFrame(payloads, "event_id long, payload binary")
    rows = {r.event_id: r for r in vad_spans(df).collect()}
    assert rows[9].error and rows[9].spans == []
    for k in range(6):
        want, _, err = vad_row(payloads[k][1], window=W)
        assert rows[k].error is None and err is None
        got = [
            (s.span_idx, s.start_sample, s.end_sample, s.start_ms, s.end_ms,
             s.n_windows)
            for s in rows[k].spans
        ]
        assert got == want


def test_vad_spans_on_structured_stream(spark, tmp_path):
    """The per-row kernels are stateless mapInPandas — they must run
    UNCHANGED on a streaming DataFrame (the north-rule shape: assets
    arriving on a stream). availableNow drain == batch result."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    payloads = []
    for k in range(4):
        x = np.zeros(W * 22, dtype=np.int16)
        x[W * 2 : W * (9 + k)] = 21000
        payloads.append((k, encode_wav(x)))
    df = spark.createDataFrame(payloads, "event_id long, payload binary")
    df.repartition(2).write.parquet(inp)

    stream = spark.readStream.schema(df.schema).parquet(inp)
    q = (
        vad_spans(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointPath", ck)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: [(s.start_sample, s.end_sample) for s in r.spans]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.event_id: [(s.start_sample, s.end_sample) for s in r.spans]
        for r in vad_spans(df).collect()
    }
    assert got == want and len(got) == 4


def test_error_contract_hardening():
    # sample_rate=0 in the header is a per-row ValueError, not a crash
    x = np.arange(W * 10, dtype=np.int16)
    bad = bytearray(encode_wav(x))
    bad[24:28] = (0).to_bytes(4, "little")
    rows, _, err = vad_row(bytes(bad), window=W)
    assert rows == [] and "sample rate" in err
    # sample_rate kwarg over a WAV payload is loud caller misuse
    with pytest.raises(TypeError, match="WAV header"):
        vad_row(encode_wav(x), window=W, sample_rate=8000)
