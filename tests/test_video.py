"""Real AVI/MJPEG video path (operators/video.py).

Independence structure mirrors the image-codec suites: fixture frames are
block-constant so the baseline-JPEG transform is exact, and every expected
pixel/motion value is computed HERE with the closed-form integer chain
(``ycc_to_rgb_int(rgb_to_ycc_int(img))`` + Rec.601 milli-luma), never by
calling the kernels under test on the same input twice."""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_mm_spark.operators import jpegcodec as J
from dataflow_mm_spark.operators import multimodal as MM
from dataflow_mm_spark.operators import video as V


def _block_constant_img(rng, h, w):
    bh, bw = -(-h // 8), -(-w // 8)
    cols = rng.integers(0, 256, size=(bh, bw, 3), dtype=np.uint8)
    return np.repeat(np.repeat(cols, 8, axis=0), 8, axis=1)[:h, :w]


def _chain(img):
    return J.ycc_to_rgb_int(J.rgb_to_ycc_int(img))


def _lum(img):
    rgb = img[..., :3].astype(np.int64)
    return 299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]


def _make_avi(rng, n_frames=3, h=12, w=10, q=2, rate=15000, scale=1000):
    frames = [_block_constant_img(rng, h, w) for _ in range(n_frames)]
    payload = V.encode_avi_mjpeg(
        [J.encode_jpeg(f, quant_luma=q, quant_chroma=q) for f in frames],
        width=w, height=h, rate=rate, scale=scale,
    )
    return frames, payload


def test_avi_roundtrip_header_and_pixels():
    rng = np.random.default_rng(51)
    frames, payload = _make_avi(rng, n_frames=4, h=16, w=24, rate=15000)
    info = V.parse_avi(payload)
    assert (info["width"], info["height"]) == (24, 16)
    assert info["n_frames"] == 4
    assert info["fps_millis"] == 15000
    decoded = V.decode_avi(payload)
    assert len(decoded) == 4
    for got, src in zip(decoded, frames):
        assert np.array_equal(got, _chain(src))


def test_avi_odd_frame_sizes_word_aligned():
    # JPEG payloads with odd byte lengths force the RIFF pad-byte path
    rng = np.random.default_rng(52)
    for trial in range(4):
        frames, payload = _make_avi(rng, n_frames=3, h=8, w=8 * (trial + 1))
        decoded = V.decode_avi(payload)
        for got, src in zip(decoded, frames):
            assert np.array_equal(got, _chain(src))


def test_motion_millisum_closed_form():
    rng = np.random.default_rng(53)
    frames, payload = _make_avi(rng, n_frames=3, h=8, w=16, q=1)
    lums = [_lum(_chain(f)) for f in frames]
    expected = sum(
        int(np.abs(lums[i] - lums[i - 1]).sum()) for i in range(1, len(lums))
    )
    assert V.motion_millisum(payload) == expected
    # single frame → zero motion
    _, one = _make_avi(rng, n_frames=1)
    assert V.motion_millisum(one) == 0


def test_decode_image_takes_first_frame():
    rng = np.random.default_rng(54)
    frames, payload = _make_avi(rng, n_frames=2, h=8, w=8)
    assert np.array_equal(MM.decode_image(payload), _chain(frames[0]))


def test_parse_avi_hostile_inputs():
    rng = np.random.default_rng(55)
    _, payload = _make_avi(rng)
    for bad in (
        b"",
        b"RIFF\x10\x00\x00\x00WAVE",          # not an AVI
        payload[:40],                            # truncated mid-header
        payload[:12],                            # bare RIFF/AVI magic
        b"RIFF" + b"\xff" * 20,
    ):
        with pytest.raises(ValueError):
            V.parse_avi(bad)
    with pytest.raises(ValueError):
        V.decode_avi(payload, [99])               # out-of-range frame index


def _box(typ: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + typ + payload


def _mp4_fixture(w, h, timescale, duration, stts_entries):
    # faststart MP4: ftyp, then moov with an AUDIO trak (0x0 tkhd — must
    # be skipped) followed by the video trak carrying mdhd + stts
    def tkhd(tw, th):
        return _box(
            b"tkhd",
            b"\x00" * 24 + b"\x00" * 16 + b"\x00" * 36
            + (tw << 16).to_bytes(4, "big") + (th << 16).to_bytes(4, "big"),
        )

    mdhd = _box(
        b"mdhd",
        b"\x00" * 12 + timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
        + b"\x00" * 4,
    )
    stts = _box(
        b"stts",
        b"\x00" * 4 + len(stts_entries).to_bytes(4, "big")
        + b"".join(
            n.to_bytes(4, "big") + d.to_bytes(4, "big") for n, d in stts_entries
        ),
    )
    mdia = _box(b"mdia", mdhd + _box(b"minf", _box(b"stbl", stts)))
    return (
        _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + _box(
            b"moov",
            _box(b"trak", tkhd(0, 0)) + _box(b"trak", tkhd(w, h) + mdia),
        )
        + _box(b"mdat", b"\x00" * 32)
    )


def test_mp4_video_info_metadata_walk():
    # 90 frames over 3s at timescale 30000 → fps 30.000
    mp4 = _mp4_fixture(1280, 720, 30000, 90000, [(60, 1000), (30, 1000)])
    info = V.mp4_video_info(mp4)
    assert (info["width"], info["height"]) == (1280, 720)
    assert info["n_frames"] == 90
    assert info["duration_millis"] == 3000
    assert info["fps_millis"] == 30000
    for bad in (b"", b"\x00\x00\x00\x08ftyp", _box(b"ftyp", b"isom")):
        with pytest.raises(ValueError):
            V.mp4_video_info(bad)


def test_video_frame_stats_mp4_metadata(spark):
    mp4 = _mp4_fixture(640, 480, 24000, 48000, [(48, 1000)])
    df = spark.createDataFrame([(3, bytearray(mp4))], "doc_id long, payload binary")
    row = V.video_frame_stats(df).first()
    assert (row.n_frames, row.fps_millis) == (48, 24000)
    assert row.motion_millisum is None
    assert "ffmpeg" in row.error


def test_video_frame_stats_mixed_column(spark):
    rng = np.random.default_rng(56)
    frames, avi = _make_avi(rng, n_frames=3, h=8, w=8, rate=12000)
    lums = [_lum(_chain(f)) for f in frames]
    exp_motion = sum(
        int(np.abs(lums[i] - lums[i - 1]).sum()) for i in range(1, 3)
    )
    png_img = _block_constant_img(rng, 8, 8)
    jpeg_payload = J.encode_jpeg(png_img)
    df = spark.createDataFrame(
        [(0, bytearray(avi)), (1, bytearray(jpeg_payload)), (2, bytearray(b"junk"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in V.video_frame_stats(df).collect()}
    assert (rows[0].n_frames, rows[0].fps_millis) == (3, 12000)
    assert rows[0].motion_millisum == exp_motion and rows[0].error is None
    assert (rows[1].n_frames, rows[1].fps_millis, rows[1].motion_millisum) == (1, 0, 0)
    assert rows[2].n_frames is None and rows[2].error is not None


def test_sample_frames_every_n(spark):
    rng = np.random.default_rng(57)
    frames, avi = _make_avi(rng, n_frames=5, h=8, w=8)
    df = spark.createDataFrame([(7, bytearray(avi))], "doc_id long, payload binary")
    rows = sorted(V.sample_frames(df, every_n=2).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        assert (r.width, r.height) == (8, 8)
        assert r.lum_millisum == int(_lum(_chain(frames[r.frame_idx])).sum())


def test_sample_frames_time_based(spark):
    # 10 frames at 5 fps (2s of video); sample every 600ms →
    # k·600·5000//10⁶ = 0,3,6,9 (then 12 ≥ 10 stops)
    rng = np.random.default_rng(60)
    frames, avi = _make_avi(rng, n_frames=10, h=8, w=8, rate=5000, scale=1000)
    df = spark.createDataFrame([(9, bytearray(avi))], "doc_id long, payload binary")
    rows = sorted(
        V.sample_frames(df, every_millis=600).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == [0, 3, 6, 9]


def test_with_asset_meta_avi_dims_and_mime(spark):
    rng = np.random.default_rng(58)
    _, avi = _make_avi(rng, n_frames=2, h=32, w=48)
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
    meta = MM.with_asset_meta(df, "payload").select("meta.*").first()
    assert meta.mime == "video/x-msvideo"
    assert (meta.width, meta.height) == (48, 32)


def test_video_frame_stats_on_structured_stream(spark, tmp_path):
    """The video kernels are stateless mapInPandas — they must run
    UNCHANGED on a streaming DataFrame (the north-rule shape: assets
    arriving on a stream). availableNow drain == batch result."""
    rng = np.random.default_rng(61)
    rows = []
    for k in range(4):
        _, avi = _make_avi(rng, n_frames=k % 3 + 2, h=8, w=8, rate=10000 + k * 1000)
        rows.append((k, bytearray(avi)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    df.repartition(2).write.parquet(inp)

    stream = spark.readStream.schema(df.schema).parquet(inp)
    q = (
        V.video_frame_stats(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = lambda r: (r.doc_id, r.n_frames, r.fps_millis, r.motion_millisum)  # noqa: E731
    got = sorted(map(key, spark.read.parquet(out).collect()))
    want = sorted(map(key, V.video_frame_stats(df).collect()))
    assert got == want and len(got) == 4


def test_luminance_and_cutout_pipeline_on_avi(spark):
    # the full image pipeline (decode → cutout → re-decode) runs unchanged
    # on a video payload via the first-frame convention
    rng = np.random.default_rng(59)
    frames, avi = _make_avi(rng, n_frames=2, h=8, w=8)
    exp = int(_lum(_chain(frames[0])).sum())
    df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
    row = MM.luminance_stats(df).first()
    assert (row.lum_millisum, row.n_px) == (exp, 64)
