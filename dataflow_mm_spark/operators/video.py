"""REAL video path in pure Python + numpy: AVI (RIFF) containers carrying
MJPEG streams (every frame a baseline JPEG decoded by
``operators/jpegcodec.py``), full GIF87a/89a animations (per-frame LZW +
the GIF89a disposal/transparency compositing model), and metadata-only
MP4 walks (dims / frame count / duration / fps from moov).

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


def _valueerror_contract(fn):
    """Normalize hostile-header failure modes to the per-row ValueError
    contract (same rule as ``multimodal.decode_image``): truncated or
    mutated containers can trip raw byte indexing deep in a walk — those
    must surface as per-row NULLs upstream, never as a job failure."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (IndexError, KeyError, OverflowError, MemoryError) as e:
            raise ValueError(f"malformed container: {e!r}") from None

    return wrapped


@_valueerror_contract
def parse_avi(buf) -> dict:
    """Bounded RIFF walk over an AVI container: returns ``width``,
    ``height``, ``fps_millis`` (1000 × frames/sec, integer — computed as
    ``dwRate * 1000 // dwScale`` from the video ``strh``), ``n_frames``
    and the list of raw MJPEG frame payloads (video-stream ``NNdc``/
    ``NNdb`` chunks, in stream order).  An ``auds`` stream, if present,
    yields ``audio_rate`` (samples/sec) and ``audio_pcm`` (its ``NNwb``
    chunk bytes concatenated — raw PCM; see :func:`extract_audio`).
    Stream numbers follow ``strh`` declaration order per the AVI spec, so
    audio-first files demux correctly too.  Raises ``ValueError`` for
    anything that is not a well-formed AVI — same per-row contract as
    ``decode_image``."""
    b = bytes(buf or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') container")
    width = height = None
    rate = scale = None
    a_rate = a_scale = None
    stream_n = 0
    vids_idx = auds_idx = None
    frames: list[bytes] = []
    audio: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, rate, scale, a_rate, a_scale
        nonlocal stream_n, vids_idx, auds_idx
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
                k = stream_n
                stream_n += 1
                if size >= 32 and b[body_lo : body_lo + 4] == b"vids":
                    if vids_idx is None:
                        vids_idx = k
                        scale = _U32(b, body_lo + 20)
                        rate = _U32(b, body_lo + 24)
                elif size >= 32 and b[body_lo : body_lo + 4] == b"auds":
                    if auds_idx is None:
                        auds_idx = k
                        a_scale = _U32(b, body_lo + 20)
                        a_rate = _U32(b, body_lo + 24)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                if vids_idx is None or int(fourcc[:2]) == vids_idx:
                    frames.append(b[body_lo:body_hi])
            elif fourcc[2:4] == b"wb" and fourcc[:2].isdigit():
                if auds_idx is not None and int(fourcc[:2]) == auds_idx:
                    audio.append(b[body_lo:body_hi])
            # chunks are word-aligned: odd sizes carry one pad byte
            i = body_lo + size + (size & 1)

    walk(12, len(b))
    if width is None or height is None:
        raise ValueError("AVI without an avih main header")
    if not width or not height:
        # r6 (r5 ADVICE): a hostile/corrupt avih with zero dims previously
        # leaked through to aspect arithmetic as ZeroDivisionError — which
        # the per-row ValueError contract did not catch, failing the task
        raise ValueError("AVI avih reports zero width/height")
    if not frames:
        raise ValueError("AVI contains no video frames")
    fps_millis = (rate * 1000 // scale) if rate and scale else 0
    return {
        "width": int(width),
        "height": int(height),
        "fps_millis": int(fps_millis),
        "n_frames": len(frames),
        "frames": frames,
        "audio_rate": int(a_rate // a_scale) if a_rate and a_scale else 0,
        "audio_pcm": b"".join(audio),
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
    audio_pcm: bytes | None = None,
    audio_rate: int = 16000,
) -> bytes:
    """Fixture-grade AVI writer: one MJPEG video stream, ``00dc`` chunks,
    word-aligned, with a standard ``idx1`` index (readers that need it get
    one; :func:`parse_avi` ignores it).  ``audio_pcm`` adds a second
    stream — ``auds`` strh + PCMWAVEFORMAT strf (16-bit mono) and a
    ``01wb`` chunk — so the demux side is exercised against a true
    two-stream container.  Every structural field a real demuxer checks —
    avih dims/frame count/stream count, ``vids``/``MJPG`` strh with
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

    n_streams = 2 if audio_pcm is not None else 1
    avih = (
        u32(1_000_000 * scale // rate)  # dwMicroSecPerFrame
        + u32(0) + u32(0) + u32(0x10)   # maxbytes, padding, AVIF_HASINDEX
        + u32(n) + u32(0) + u32(n_streams) + u32(0)  # frames, initial, streams, bufsz
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
    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    if audio_pcm is not None:
        astrh = (
            b"auds" + b"\x00" * 4
            + u32(0) + u16(0) + u16(0) + u32(0)
            + u32(1) + u32(audio_rate) + u32(0) + u32(len(audio_pcm) // 2)
            + u32(0) + u32(0) + u32(2)  # bufsize, quality, dwSampleSize=2
            + u16(0) * 4
        )
        astrf = (  # PCMWAVEFORMAT: tag 1, mono, 16-bit
            u16(1) + u16(1) + u32(audio_rate) + u32(audio_rate * 2)
            + u16(2) + u16(16)
        )
        strl += list_chunk(
            b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf)
        )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    offsets = []
    for f in frames_jpeg:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc within movi
        movi_body += chunk(b"00dc", f)
    if audio_pcm is not None:
        movi_body += chunk(b"01wb", audio_pcm)
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


@_valueerror_contract
def gif_frames(buf) -> list:
    """Decode EVERY frame of a GIF87a/89a animation, composited onto the
    logical screen per the GIF89a disposal model — returns
    ``[(delay_millis, (H, W, 3) uint8 RGB canvas), ...]``.

    Semantics (all real, pure Python + numpy, reusing the engine's
    variable-width LZW decoder): the canvas starts as the background color
    (global-color-table[background index], black without a GCT); each
    image descriptor draws its rect at (left, top) skipping
    transparent-index pixels; disposal 0/1 leave the canvas, 2 restores
    the background color over the frame rect, 3 restores the pre-frame
    canvas.  Delay is the GCE's centiseconds × 10 (millis).  Raises
    ValueError on malformed input (per-row contract).  The reference
    samples GIFs via PIL ``seek`` (multimodal loaders); this is that
    surface without PIL."""
    import numpy as np

    from dataflow_mm_spark.operators.multimodal import _gif_lzw_decode

    b = bytes(buf or b"")
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    packed = b[10]
    bg_idx = b[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    if sw <= 0 or sh <= 0:
        raise ValueError("bad logical screen dimensions")
    if sw * sh > (1 << 26):  # 64M px — hostile-header allocation guard
        raise ValueError("logical screen too large")
    bg = (
        gct[bg_idx] if gct is not None and bg_idx < gct.shape[0]
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg, (sh, sw, 3)).astype(np.uint8).copy()
    frames: list = []
    # pending graphic-control state for the NEXT image descriptor
    disposal, transparent, delay_ms = 0, None, 0
    while pos < len(b):
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated extension")
            label = b[pos]
            pos += 1
            sub0 = pos
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            if label == 0xF9 and b[sub0] >= 4:  # graphic control
                flags = b[sub0 + 1]
                disposal = (flags >> 2) & 0x07
                delay_ms = int.from_bytes(b[sub0 + 2 : sub0 + 4], "little") * 10
                transparent = b[sub0 + 4] if flags & 1 else None
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated image descriptor")
        left = int.from_bytes(b[pos : pos + 2], "little")
        top = int.from_bytes(b[pos + 2 : pos + 4], "little")
        w = int.from_bytes(b[pos + 4 : pos + 6], "little")
        h = int.from_bytes(b[pos + 6 : pos + 8], "little")
        ipacked = b[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                b, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("frame rect outside the logical screen")
        min_code_size = b[pos]
        pos += 1
        chunks = []
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _gif_lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlace
            order = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        if (len(frames) + 1) * sw * sh > (1 << 28):
            # 256M px across all composited copies — hostile-animation guard
            raise ValueError("animation too large to composite")
        before = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + h, left : left + w]
        mask = (idx != transparent) if transparent is not None else slice(None)
        rect[mask] = pal[idx][mask]
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3:
            canvas = before
        disposal, transparent, delay_ms = 0, None, 0
    if not frames:
        raise ValueError("GIF contains no image")
    return frames


@_valueerror_contract
def gif_meta(buf) -> dict:
    """Metadata-only GIF walk for ``video_info`` (r5 ADVICE): frame count,
    per-frame GCE delays and logical-screen dims WITHOUT LZW decode or
    canvas compositing — ``gif_frames`` composites a full RGB canvas copy
    per frame (up to the guard, ~hundreds of MB retained on a large
    animation) just to answer n_frames/fps/dims.  Mirrors gif_frames'
    structural validation (magic, screen dims, descriptor rects, block
    framing, the same size guards) so the success/failure verdict agrees
    on every structurally-valid payload; LZW payload corruption (bad
    codes, palette-index overflow) is only detectable by the full decoders
    — the same metadata-only contract as ``mp4_video_info``."""
    b = bytes(buf or b"")
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    packed = b[10]
    pos = 13
    has_gct = bool(packed & 0x80)
    if has_gct:
        pos += 3 * (2 << (packed & 0x07))
    if sw <= 0 or sh <= 0:
        raise ValueError("bad logical screen dimensions")
    if sw * sh > (1 << 26):  # 64M px — hostile-header allocation guard
        raise ValueError("logical screen too large")
    delays: list[int] = []
    delay_ms = 0
    while pos < len(b):
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated extension")
            label = b[pos]
            pos += 1
            sub0 = pos
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            if label == 0xF9 and b[sub0] >= 4:  # graphic control
                delay_ms = int.from_bytes(b[sub0 + 2 : sub0 + 4], "little") * 10
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated image descriptor")
        left = int.from_bytes(b[pos : pos + 2], "little")
        top = int.from_bytes(b[pos + 2 : pos + 4], "little")
        w = int.from_bytes(b[pos + 4 : pos + 6], "little")
        h = int.from_bytes(b[pos + 6 : pos + 8], "little")
        ipacked = b[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        elif not has_gct:
            raise ValueError("GIF image without a color table")
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("frame rect outside the logical screen")
        if (len(delays) + 1) * sw * sh > (1 << 28):
            raise ValueError("animation too large to composite")
        pos += 1  # min code size
        while pos < len(b) and b[pos] != 0:
            pos += 1 + b[pos]
        pos += 1  # block terminator
        delays.append(delay_ms)
        delay_ms = 0
    if not delays:
        raise ValueError("GIF contains no image")
    return {
        "width": sw,
        "height": sh,
        "n_frames": len(delays),
        "duration_millis": sum(delays),
    }


@_valueerror_contract
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


def _motion_millisum_frames(frames) -> int:
    """Motion core over already-extracted MJPEG frame payloads — lets
    callers that hold a ``parse_avi`` result (video_frame_stats) avoid a
    second full RIFF walk + frame re-slice (r5 ADVICE)."""
    total = 0
    prev = None
    for fr in frames:
        cur = _lum_milli(decode_image(fr))
        if prev is not None:
            if cur.shape != prev.shape:
                raise ValueError("inter-frame dimension change")
            total += int(abs(cur - prev).sum())
        prev = cur
    return total


def motion_millisum(buf) -> int:
    """Integer-exact motion score of an AVI: Σ_f Σ_px |lum₁₀₀₀(f) −
    lum₁₀₀₀(f−1)| over consecutive decoded frames (``f ≥ 1``).  A
    single-frame video scores 0.  Reference semantics:
    ``video_motion_score_filter.py`` (mean inter-frame difference — this is
    the undivided integer sum so oracles replay it exactly; callers divide
    by ``(n_frames−1)·n_px·1000`` for the reference's mean)."""
    return _motion_millisum_frames(parse_avi(buf)["frames"])


def video_frame_stats(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-asset frame statistics over a mixed image/video binary column:
    ``n_frames`` / ``fps_millis`` / ``motion_millisum`` (all int64).  AVI
    payloads run the real container walk + per-frame MJPEG decode; GIF
    animations run the full disposal/transparency compositing
    (``gif_frames`` — delays → mean fps, motion over composited canvases);
    MP4 payloads get real metadata (``mp4_video_info`` — n_frames/fps from
    the moov walk) with NULL motion and the ffmpeg-gap note in ``error``
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
                        # reuse the parsed frame payloads — motion_millisum(b)
                        # would re-walk the whole RIFF tree (r5 ADVICE)
                        mot.append(_motion_millisum_frames(info["frames"]))
                        errs.append(None)
                    elif b[4:8] == b"ftyp":
                        info = mp4_video_info(b)
                        nf.append(info["n_frames"])
                        fps.append(info["fps_millis"])
                        mot.append(None)
                        errs.append(
                            "mp4 metadata real; frame decode requires ffmpeg"
                        )
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        # animated GIF = a real multi-frame format too:
                        # delays -> mean fps, motion over composited frames
                        gfs = gif_frames(b)
                        nf.append(len(gfs))
                        dur = sum(d for d, _ in gfs)
                        fps.append(
                            len(gfs) * 1_000_000 // dur if dur > 0 else 0
                        )
                        total, prev = 0, None
                        for _, img in gfs:
                            cur = _lum_milli(img)
                            if prev is not None:
                                total += int(abs(cur - prev).sum())
                            prev = cur
                        mot.append(total)
                        errs.append(None)
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


def video_info(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """The reference's ``video_info`` dict as typed columns
    (video_info_filter.py:324-336: ``{success, num_frames, height, width,
    aspect_ratio, resolution, fps, duration_sec}`` via cv2.VideoCapture) —
    here from the real in-engine walks: AVI/MJPEG (full container parse),
    animated GIF (frame count + delay sum), MP4 (metadata moov walk), and
    still images (single-frame, dims from the real decode).  Ratios kept
    integer for oracle replay: ``aspect_milli = 1000*w//h``,
    ``fps_millis``, ``duration_millis``.  Failed rows get
    ``success=false`` + NULL metrics, never a job failure — exactly the
    reference's ``{'success': False}`` row contract."""
    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = (
        f"{ids_schema}, success boolean, num_frames bigint, width int, "
        "height int, aspect_milli bigint, resolution bigint, "
        "fps_millis bigint, duration_millis bigint"
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
                        nf, w, h = info["n_frames"], info["width"], info["height"]
                        fps = info["fps_millis"]
                        dur = nf * 1_000_000 // fps if fps > 0 else 0
                    elif b[4:8] == b"ftyp":
                        info = mp4_video_info(b)
                        nf, w, h = info["n_frames"], info["width"], info["height"]
                        fps, dur = info["fps_millis"], info["duration_millis"]
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        # metadata-only walk — gif_frames would composite
                        # (and retain) a full canvas copy per frame just to
                        # report counts/dims here (r5 ADVICE)
                        meta = gif_meta(b)
                        nf, w, h = meta["n_frames"], meta["width"], meta["height"]
                        dur = meta["duration_millis"]
                        fps = nf * 1_000_000 // dur if dur > 0 else 0
                    else:
                        img = decode_image(b)
                        h, w = img.shape[:2]
                        nf, fps, dur = 1, 0, 0
                    rows.append(
                        [*ids, True, nf, w, h, 1000 * w // h, w * h, fps, dur]
                    )
                except (ValueError, ZeroDivisionError):
                    # ZeroDivisionError: defense-in-depth for any decoder
                    # that reports zero height (parse_avi now rejects it)
                    rows.append(
                        [*ids, False, None, None, None, None, None, None, None]
                    )
            yield pd.DataFrame(
                rows,
                columns=[*id_cols, "success", "num_frames", "width", "height",
                         "aspect_milli", "resolution", "fps_millis",
                         "duration_millis"],
            )

    return df.mapInPandas(gen, schema)


def extract_audio(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """A/V demux without ffmpeg: pull the PCM soundtrack out of an AVI
    (``auds`` stream's ``NNwb`` chunks) and re-wrap it as a RIFF/WAVE
    binary so the whole audio chain (``operators/audio.py``: decode →
    energy → VAD FSM → sessionization) runs on video soundtracks
    unchanged.  WAV payloads pass through as-is (rate re-read from their
    own header).  Outputs ``sample_rate`` + ``wav``; rows without an
    extractable track get NULLs + an error string (per-row contract)."""
    import numpy as np

    from dataflow_mm_spark.operators.audio import decode_wav, encode_wav

    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = f"{ids_schema}, sample_rate int, wav binary, error string"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, wavs, errs = [], [], []
            for payload in pdf[bin_col]:
                b = bytes(payload or b"")
                try:
                    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                        info = parse_avi(b)
                        if not info["audio_pcm"] or not info["audio_rate"]:
                            raise ValueError("AVI carries no audio stream")
                        pcm = info["audio_pcm"]
                        samples = np.frombuffer(
                            pcm[: len(pcm) // 2 * 2], dtype="<i2"
                        )
                        rates.append(info["audio_rate"])
                        wavs.append(encode_wav(samples, info["audio_rate"]))
                    elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                        _, sr = decode_wav(b)  # validates the container
                        rates.append(sr)
                        wavs.append(b)
                    else:
                        raise ValueError(
                            "no extractable audio (AVI soundtrack or WAV)"
                        )
                    errs.append(None)
                except ValueError as e:
                    rates.append(None)
                    wavs.append(None)
                    errs.append(str(e))
            out = pdf[list(id_cols)].copy()
            out["sample_rate"] = pd.array(rates, dtype="Int32")
            out["wav"] = wavs
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
    # fail fast at the driver: every_millis=0 would loop forever in both
    # the AVI (k*0//1e6 == 0 < n_frames) and GIF (0 < acc) index walks,
    # hanging the executor (r5 ADVICE); every_n=0 would raise a per-row
    # range() ValueError masquerading as a payload error
    if every_millis is not None and every_millis <= 0:
        raise ValueError("every_millis must be positive")
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
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
                    elif b[:6] in (b"GIF87a", b"GIF89a"):
                        gfs = gif_frames(b)
                        delays = [d for d, _ in gfs]
                        if every_millis is not None and sum(delays) > 0:
                            # GIF delays are PER-FRAME: the frame shown at
                            # tick t is the last one whose cumulative
                            # start time <= t (bisect over starts)
                            import bisect

                            starts, acc = [], 0
                            for d in delays:
                                starts.append(acc)
                                acc += d
                            idxs, k, seen = [], 0, set()
                            while k * every_millis < acc:
                                ix = (
                                    bisect.bisect_right(
                                        starts, k * every_millis
                                    ) - 1
                                )
                                if ix not in seen:
                                    seen.add(ix)
                                    idxs.append(ix)
                                k += 1
                        else:
                            idxs = list(range(0, len(gfs), every_n))
                        imgs = [gfs[i][1] for i in idxs]
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
