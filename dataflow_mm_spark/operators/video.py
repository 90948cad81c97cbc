"""REAL video path in pure Python + numpy: AVI (RIFF) containers carrying
MJPEG streams, every frame a baseline JPEG decoded by
``operators/jpegcodec.py``.

The reference loads video per row with cv2/ffmpeg — resolution gates
(``dataflow/operators/core_vision/filter/video_info_filter.py:324-336``),
motion scoring over consecutive frames
(``core_vision/filter/video_motion_score_filter.py``) and frame sampling
for VLM prompts.  Inter-frame codecs (H.264 &c.) genuinely need ffmpeg and
stay the documented pluggable gap, but MJPEG-in-AVI is just a RIFF chunk
walk over per-frame baseline JPEGs — exactly the codec this engine already
decodes end-to-end — so the container walk, frame decode, frame sampling
and motion kernel are all real here.

Scale shape: the container walk and per-frame decode are Arrow-batched
``mapInPandas`` stages over an opaque binary column (same contract as
``operators/multimodal.py``); malformed payloads surface as per-row NULLs
plus an error string, never a job failure.  Wide payload bytes cross the
Arrow boundary once per stage; derived stats are narrow int64 columns.

Integer-exact conventions (shared with the gate oracles):
* luma is Rec.601 in milli-units, ``lum₁₀₀₀ = 299·R + 587·G + 114·B``
  summed in int64 (same as ``multimodal.luminance_stats``);
* the motion score between consecutive frames is the int64 sum of
  per-pixel ``|lum₁₀₀₀(f) − lum₁₀₀₀(f−1)|`` — no floats anywhere, so a
  DuckDB oracle can replay it closed-form.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from dataflow_mm_spark.operators.multimodal import decode_image

_U32 = lambda b, i: int.from_bytes(b[i : i + 4], "little")  # noqa: E731


def parse_avi(buf) -> dict:
    """Bounded RIFF walk over an AVI container: returns ``width``,
    ``height``, ``fps_millis`` (1000 × frames/sec, integer — computed as
    ``dwRate * 1000 // dwScale`` from the video ``strh``), ``n_frames``
    and the list of raw MJPEG frame payloads (stream-0 ``00dc``/``00db``
    chunks, in stream order).  Raises ``ValueError`` for anything that is
    not a well-formed AVI — same per-row contract as ``decode_image``."""
    b = bytes(buf or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') container")
    width = height = None
    rate = scale = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, rate, scale
        i = lo
        while i + 8 <= hi:
            fourcc = b[i : i + 4]
            size = _U32(b, i + 4)
            body_lo, body_hi = i + 8, min(i + 8 + size, hi)
            if body_hi < body_lo:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                # list subtype occupies the first 4 body bytes
                sub = b[body_lo : body_lo + 4]
                if sub in (b"hdrl", b"strl", b"movi"):
                    walk(body_lo + 4, body_hi)
            elif fourcc == b"avih":
                if size >= 40:
                    width = _U32(b, body_lo + 32)
                    height = _U32(b, body_lo + 36)
            elif fourcc == b"strh":
                if size >= 32 and b[body_lo : body_lo + 4] == b"vids":
                    scale = _U32(b, body_lo + 20)
                    rate = _U32(b, body_lo + 24)
            elif fourcc in (b"00dc", b"00db"):
                frames.append(b[body_lo:body_hi])
            # chunks are word-aligned: odd sizes carry one pad byte
            i = body_lo + size + (size & 1)

    walk(12, len(b))
    if width is None or height is None:
        raise ValueError("AVI without an avih main header")
    if not frames:
        raise ValueError("AVI contains no stream-0 video frames")
    fps_millis = (rate * 1000 // scale) if rate and scale else 0
    return {
        "width": int(width),
        "height": int(height),
        "fps_millis": int(fps_millis),
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_avi(buf, indices: list[int] | None = None) -> list:
    """Decode MJPEG frames of an AVI to ``(h, w, 3)`` uint8 arrays via the
    pure-numpy baseline-JPEG kernel.  ``indices=None`` decodes every frame;
    out-of-range indices raise ``ValueError`` (per-row contract)."""
    info = parse_avi(buf)
    frames = info["frames"]
    if indices is None:
        indices = list(range(len(frames)))
    out = []
    for ix in indices:
        if not 0 <= ix < len(frames):
            raise ValueError(f"frame index {ix} out of range 0..{len(frames) - 1}")
        out.append(decode_image(frames[ix]))
    return out


def encode_avi_mjpeg(
    frames_jpeg: list[bytes],
    width: int,
    height: int,
    rate: int = 12000,
    scale: int = 1000,
) -> bytes:
    """Fixture-grade AVI writer: one MJPEG video stream, ``00dc`` chunks,
    word-aligned, with a standard ``idx1`` index (readers that need it get
    one; :func:`parse_avi` ignores it).  Every structural field a real
    demuxer checks — avih dims/frame count, ``vids``/``MJPG`` strh with
    rate/scale, BITMAPINFOHEADER strf — is populated, so the decoder side
    is exercised against honestly-framed input, not a shortcut blob."""
    n = len(frames_jpeg)

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, "little")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + u32(len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = (
        u32(1_000_000 * scale // rate)  # dwMicroSecPerFrame
        + u32(0) + u32(0) + u32(0x10)   # maxbytes, padding, AVIF_HASINDEX
        + u32(n) + u32(0) + u32(1) + u32(0)  # totalframes, initial, streams, bufsize
        + u32(width) + u32(height)
        + u32(0) * 4
    )
    strh = (
        b"vids" + b"MJPG"
        + u32(0) + u16(0) + u16(0) + u32(0)  # flags, priority, language, initial
        + u32(scale) + u32(rate) + u32(0) + u32(n)  # scale, rate, start, length
        + u32(0) + u32(0) + u32(0)  # bufsize, quality, samplesize
        + u16(0) + u16(0) + u16(width) + u16(height)  # rcFrame
    )
    strf = (
        u32(40) + int(width).to_bytes(4, "little", signed=True)
        + int(height).to_bytes(4, "little", signed=True)
        + u16(1) + u16(24) + b"MJPG" + u32(width * height * 3)
        + u32(0) * 4
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    offsets = []
    for f in frames_jpeg:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc within movi
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + u32(0x10) + u32(off) + u32(len(f))  # AVIIF_KEYFRAME
            for off, f in zip(offsets, frames_jpeg)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + u32(len(riff_body)) + riff_body


def mp4_video_info(buf) -> dict:
    """Metadata-only ISO-BMFF walk (faststart layout, moov before mdat —
    the streaming norm): ``width``/``height`` from the first video track's
    ``tkhd`` (16.16 fixed), ``n_frames`` as the ``stts`` sample-count sum,
    ``duration_millis`` from ``mdhd`` timescale/duration, and integer
    ``fps_millis = n_frames * 1000 * timescale // duration``.  This is the
    ``video_info_filter.py:324-336`` surface (the reference reads fps /
    frame count / resolution via cv2.VideoCapture properties) without any
    frame decode — inter-frame H.264/HEVC payloads stay the ffmpeg gap.
    Raises ValueError on anything that is not an MP4 with a video track."""
    b = bytes(buf or b"")
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (ftyp) container")

    def children(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(b[i : i + 4], "big")
            typ = b[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > hi:
                    return
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:
                size = hi - i
            if size < hdr:
                return
            yield typ, i + hdr, min(i + size, hi)
            i += size

    def find(lo: int, hi: int, typ: bytes):
        for t, clo, chi in children(lo, hi):
            if t == typ:
                return (clo, chi)
        return None

    moov = find(0, len(b), b"moov")
    if not moov:
        raise ValueError("MP4 without a moov box in the parsed range")
    for t, tlo, thi in children(*moov):
        if t != b"trak":
            continue
        tkhd = find(tlo, thi, b"tkhd")
        if not tkhd:
            continue
        klo, khi = tkhd
        ver = b[klo]
        off = klo + (88 if ver == 1 else 76)
        if off + 8 > khi:
            continue
        w = int.from_bytes(b[off : off + 4], "big") >> 16
        h = int.from_bytes(b[off + 4 : off + 8], "big") >> 16
        if not (w and h):
            continue  # audio track (0x0) — keep scanning
        mdia = find(tlo, thi, b"mdia")
        if not mdia:
            raise ValueError("video trak without mdia")
        mdhd = find(*mdia, b"mdhd")
        if not mdhd:
            raise ValueError("video trak without mdhd")
        mlo, mhi = mdhd
        mver = b[mlo]
        if mver == 1:
            timescale = int.from_bytes(b[mlo + 20 : mlo + 24], "big")
            duration = int.from_bytes(b[mlo + 24 : mlo + 32], "big")
        else:
            timescale = int.from_bytes(b[mlo + 12 : mlo + 16], "big")
            duration = int.from_bytes(b[mlo + 16 : mlo + 20], "big")
        minf = find(*mdia, b"minf")
        stbl = find(*minf, b"stbl") if minf else None
        stts = find(*stbl, b"stts") if stbl else None
        n_frames = 0
        if stts:
            slo, shi = stts
            n_entries = int.from_bytes(b[slo + 4 : slo + 8], "big")
            for e in range(n_entries):
                eo = slo + 8 + 8 * e
                if eo + 8 > shi:
                    raise ValueError("truncated stts")
                n_frames += int.from_bytes(b[eo : eo + 4], "big")
        if not (timescale and duration):
            raise ValueError("mdhd without timescale/duration")
        return {
            "width": w,
            "height": h,
            "n_frames": n_frames,
            "duration_millis": duration * 1000 // timescale,
            "fps_millis": n_frames * 1000 * timescale // duration,
        }
    raise ValueError("MP4 contains no video track with nonzero dims")


def _lum_milli(img) -> "object":
    import numpy as np

    rgb = img[..., :3].astype(np.int64)
    return 299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]


def motion_millisum(buf) -> int:
    """Integer-exact motion score of an AVI: Σ_f Σ_px |lum₁₀₀₀(f) −
    lum₁₀₀₀(f−1)| over consecutive decoded frames (``f ≥ 1``).  A
    single-frame video scores 0.  Reference semantics:
    ``video_motion_score_filter.py`` (mean inter-frame difference — this is
    the undivided integer sum so oracles replay it exactly; callers divide
    by ``(n_frames−1)·n_px·1000`` for the reference's mean)."""
    imgs = decode_avi(buf)
    total = 0
    prev = None
    for img in imgs:
        cur = _lum_milli(img)
        if prev is not None:
            if cur.shape != prev.shape:
                raise ValueError("inter-frame dimension change")
            total += int(abs(cur - prev).sum())
        prev = cur
    return total


def video_frame_stats(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-asset frame statistics over a mixed image/video binary column:
    ``n_frames`` / ``fps_millis`` / ``motion_millisum`` (all int64).  AVI
    payloads run the real container walk + per-frame MJPEG decode; MP4
    payloads get real metadata (``mp4_video_info`` — n_frames/fps from the
    moov walk) with NULL motion and the ffmpeg-gap note in ``error``
    (inter-frame decode is out of scope); still images (any of the four
    real codecs) are single-frame videos — ``(1, 0, 0)``.  Malformed
    payloads yield NULL stats + an error string, never a job failure
    (``video_info_filter.py`` analogue: the reference drops unreadable
    assets row-wise)."""
    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = (
        f"{ids_schema}, n_frames bigint, fps_millis bigint, "
        "motion_millisum bigint, error string"
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            nf, fps, mot, errs = [], [], [], []
            for payload in pdf[bin_col]:
                b = bytes(payload or b"")
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                        info = parse_avi(b)
                        nf.append(info["n_frames"])
                        fps.append(info["fps_millis"])
                        mot.append(motion_millisum(b))
                        errs.append(None)
                    elif b[4:8] == b"ftyp":
                        info = mp4_video_info(b)
                        nf.append(info["n_frames"])
                        fps.append(info["fps_millis"])
                        mot.append(None)
                        errs.append(
                            "mp4 metadata real; frame decode requires ffmpeg"
                        )
                    else:
                        decode_image(b)  # validates it IS a decodable image
                        nf.append(1)
                        fps.append(0)
                        mot.append(0)
                        errs.append(None)
                except ValueError as e:
                    nf.append(None)
                    fps.append(None)
                    mot.append(None)
                    errs.append(str(e))
            out = pdf[list(id_cols)].copy()
            out["n_frames"] = pd.array(nf, dtype="Int64")
            out["fps_millis"] = pd.array(fps, dtype="Int64")
            out["motion_millisum"] = pd.array(mot, dtype="Int64")
            out["error"] = errs
            yield out

    return df.mapInPandas(gen, schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 1,
    every_millis: int | None = None,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Frame sampling for VLM prompting (W4 analogue over REAL decode):
    explode every ``every_n``-th frame of each AVI to one row with the
    frame index, dims and integer luma sum.  ``every_millis`` switches to
    time-based sampling (the reference samples by seconds): frame indices
    ``k·every_millis·fps_millis // 10⁶`` for k = 0,1,… deduplicated —
    integer arithmetic throughout so oracles can replay the index set;
    falls back to ``every_n`` when the container carries no rate.
    Still-image payloads emit their single frame as index 0.  Narrow
    int64 outputs only — decoded pixel arrays never leave the executor."""
    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = (
        f"{ids_schema}, frame_idx int, width int, height int, "
        "lum_millisum bigint, error string"
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                ids = [getattr(r, c) for c in id_cols]
                b = bytes(getattr(r, bin_col) or b"")
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                        info = parse_avi(b)
                        if every_millis is not None and info["fps_millis"] > 0:
                            idxs, k, seen = [], 0, set()
                            while True:
                                ix = (
                                    k * every_millis * info["fps_millis"]
                                    // 1_000_000
                                )
                                if ix >= info["n_frames"]:
                                    break
                                if ix not in seen:
                                    seen.add(ix)
                                    idxs.append(ix)
                                k += 1
                        else:
                            idxs = list(range(0, info["n_frames"], every_n))
                        imgs = decode_avi(b, idxs)
                    else:
                        idxs, imgs = [0], [decode_image(b)]
                    for ix, img in zip(idxs, imgs):
                        h, w = img.shape[:2]
                        rows.append(
                            [*ids, ix, w, h, int(_lum_milli(img).sum()), None]
                        )
                except ValueError as e:
                    rows.append([*ids, None, None, None, None, str(e)])
            yield pd.DataFrame(
                rows,
                columns=[
                    *id_cols, "frame_idx", "width", "height",
                    "lum_millisum", "error",
                ],
            )

    return df.mapInPandas(gen, schema)
