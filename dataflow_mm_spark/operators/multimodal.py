"""Multimodal asset columns — binary payloads + typed metadata.

The reference loads images/audio/video lazily per row from paths
(utils/utils.py:27-50) and probes metadata with cv2/PIL
(video_info_filter.py:324-336). This engine treats assets as opaque
``binary`` columns with explicit metadata structs; the heavy decode /
feature-extract / resize / frame-sample kernels run as Arrow-batched
``mapInPandas`` so the Spark-side plumbing (schema, partition sizing, batch
shape) is real and tested.  THREE codecs are REAL end-to-end with no image
library: uncompressed BMP (numpy decode/encode), PNG (stdlib-zlib DEFLATE +
all five scanline filters, ``decode_png``), and GIF (pure-Python
variable-width LZW, ``decode_gif``) — plus NN resize and seg-cutout mask
application over any of them (``decode_image`` sniffs the magic).  JPEG and
video decode still need cv2/ffmpeg (custom Huffman+DCT / inter-frame
coders), absent in this container, so those raise NotImplementedError
unless ``fake=True`` (deterministic fake so the pipeline shape stays
exercisable).

Partitioning note: asset rows are large — callers should repartition so a
partition holds ~64-256MB of payload (spark.sql.files.maxPartitionBytes
handles the scan side; after joins use repartition(n)).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def _be_int(b, pos: int, n: int):
    """Big-endian unsigned int from ``n`` bytes at 1-based ``pos`` — pure
    Catalyst (hex → base-16 conv), no Python. try_cast: a hostile header
    with a value ≥ 2^31 yields NULL instead of an ANSI CAST_OVERFLOW that
    would kill the whole job."""
    return F.conv(F.hex(F.substring(b, pos, n)), 16, 10).try_cast("int")


def _le_int16(b, pos: int):
    """Little-endian uint16 at 1-based ``pos``."""
    return (
        F.conv(F.hex(F.substring(b, pos, 1)), 16, 10)
        + F.conv(F.hex(F.substring(b, pos + 1, 1)), 16, 10) * 256
    ).try_cast("int")


def _le_int32_signed(b, pos: int):
    """Little-endian SIGNED int32 at 1-based ``pos``. BMP dims are signed:
    top-down BMPs store height negative (biHeight < 0 per BITMAPINFOHEADER),
    so the raw unsigned read must be sign-extended before casting — an
    unsigned read of e.g. -768 is 4294966528 and ANSI cast('int') throws
    CAST_OVERFLOW on a perfectly valid file."""
    out = F.lit(0).cast("bigint")
    for i in range(4):
        out = out + F.conv(F.hex(F.substring(b, pos + i, 1)), 16, 10) * (256 ** i)
    signed = F.when(out >= F.lit(2 ** 31), out - F.lit(2 ** 32)).otherwise(out)
    return signed.try_cast("int")


_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def _jpeg_sof_dims(buf) -> tuple[int, int] | None:
    """Bounded JPEG marker walk over a header prefix: skip fill bytes and
    zero-payload markers, follow segment lengths, return (width, height) from
    the first SOFn frame header. Dims precede SOS in any decodable JPEG, so
    hitting SOS/EOI without a SOF → None. Pure-python but runs inside an
    Arrow batch and sees ≤64KB per row (the JPEG prefix only)."""
    if buf is None:
        return None
    buf = bytes(buf)
    n = len(buf)
    if n < 4 or buf[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 <= n:
        if buf[i] != 0xFF:
            i += 1
            continue
        marker = buf[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            return None
        seglen = (buf[i + 2] << 8) | buf[i + 3]
        if seglen < 2:
            return None
        if marker in _SOF_MARKERS:
            h = (buf[i + 5] << 8) | buf[i + 6]
            w = (buf[i + 7] << 8) | buf[i + 8]
            return (w, h)
        i += 2 + seglen
    return None


def _mp4_tkhd_dims(buf) -> tuple[int, int] | None:
    """Bounded ISO-BMFF box walk: find moov → trak → tkhd and read the
    16.16-fixed width/height of the first track with nonzero dims (the
    video track; audio tracks carry 0×0). Works on faststart files (moov
    before mdat — the streaming-layout norm); a tail-moov file outside the
    prefix yields None, the decode kernel's job."""
    if buf is None:
        return None
    buf = bytes(buf)
    n = len(buf)

    def walk(lo: int, hi: int, want: bytes):
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(buf[i : i + 4], "big")
            typ = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if i + 16 > hi:
                    return None
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:  # box runs to end of enclosing scope
                size = hi - i
            if size < hdr:
                return None
            if typ == want:
                return (i + hdr, min(i + size, hi))
            i += size
        return None

    if n < 12 or buf[4:8] != b"ftyp":
        return None
    moov = walk(0, n, b"moov")
    if not moov:
        return None
    lo, hi = moov
    while True:
        trak = walk(lo, hi, b"trak")
        if not trak:
            return None
        tlo, thi = trak
        tkhd = walk(tlo, thi, b"tkhd")
        if tkhd:
            klo, khi = tkhd
            ver = buf[klo] if klo < n else 0
            # payload-relative: ver+flags(4) + times/ids (20 v0 / 32 v1) +
            # reserved/layer/volume (16) + matrix (36) → width@76 (v0) / 88
            off = klo + (88 if ver == 1 else 76)
            if off + 8 <= khi:
                w = int.from_bytes(buf[off : off + 4], "big") >> 16
                h = int.from_bytes(buf[off + 4 : off + 8], "big") >> 16
                if w and h:
                    return (w, h)
        lo = thi  # next sibling trak
        if lo >= hi:
            return None


def _avi_avih_dims(buf) -> tuple[int, int] | None:
    """Bounded RIFF walk over an AVI *prefix*: dims live in the ``avih``
    main header inside ``LIST hdrl``, which by the AVI spec precedes the
    frame data — a 64KB prefix always contains it.  Tolerates truncation
    (returns None instead of raising; the full-file contract is
    ``operators/video.py:parse_avi``)."""
    if buf is None:
        return None
    b = bytes(buf)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    i, hi = 12, len(b)
    stack = []
    while True:
        if i + 8 > hi:
            if stack:
                i, hi = stack.pop()
                continue
            return None
        fourcc = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        nxt = i + 8 + size + (size & 1)
        if fourcc == b"LIST" and b[i + 8 : i + 12] == b"hdrl":
            stack.append((nxt, hi))
            i, hi = i + 12, min(nxt, hi)
            continue
        if fourcc == b"avih" and size >= 40 and i + 48 <= hi:
            w = int.from_bytes(b[i + 40 : i + 44], "little")
            h = int.from_bytes(b[i + 44 : i + 48], "little")
            return (w, h) if w and h else None
        i = nxt


def _jpeg_dims_udf():
    @F.pandas_udf("struct<width:int,height:int>")
    def media_dims(prefix: pd.Series) -> pd.DataFrame:
        dims = []
        for b in prefix:
            d = _jpeg_sof_dims(b)
            if d is None and b is not None and bytes(b[4:8]) == b"ftyp":
                d = _mp4_tkhd_dims(b)
            if d is None and b is not None and bytes(b[:4]) == b"RIFF":
                d = _avi_avih_dims(b)
            dims.append(d)
        return pd.DataFrame(
            {
                "width": pd.array([d[0] if d else None for d in dims], dtype="Int32"),
                "height": pd.array([d[1] if d else None for d in dims], dtype="Int32"),
            }
        )

    return media_dims


def with_asset_meta(
    df: DataFrame,
    bin_col: str = "payload",
    out: str = "meta",
    jpeg_scan: bool = True,
) -> DataFrame:
    """Cheap metadata from the binary itself, no decode: magic sniff, sha256,
    and REAL pixel dimensions parsed from the fixed-offset headers of PNG
    (IHDR, big-endian at byte 17/21), GIF (logical screen, little-endian at
    7/9) and BMP (BITMAPINFOHEADER at 19/23) in pure Catalyst. JPEG dims
    (variable-offset SOF marker) and MP4 dims (moov→trak→tkhd box walk,
    first nonzero-dim track) are parsed by bounded walks in one
    Arrow-batched UDF over a 64KB/256KB prefix (the decode-kernel edge in
    this operator; other rows cross the Arrow boundary as NULL so wide
    payloads never ship to Python). Set ``jpeg_scan=False`` for a strictly
    JVM-only plan. This makes resolution-range filters
    (video_info_filter.py:324-336 analogue) real for PNG/GIF/BMP/JPEG/MP4
    without any codec."""
    b = F.col(bin_col)
    is_jpg = F.substring(b, 1, 3) == bytes([0xFF, 0xD8, 0xFF])
    is_png = F.substring(b, 1, 4) == b"\x89PNG"
    is_gif = F.substring(b, 1, 4) == b"GIF8"
    is_bmp = F.substring(b, 1, 2) == b"BM"
    is_mp4 = F.substring(b, 5, 4) == b"ftyp"
    is_avi = (F.substring(b, 1, 4) == b"RIFF") & (F.substring(b, 9, 4) == b"AVI ")
    mime = (
        F.when(is_jpg, "image/jpeg")
        .when(is_png, "image/png")
        .when(is_gif, "image/gif")
        .when(is_bmp, "image/bmp")
        .when(is_mp4, "video/mp4")
        .when(is_avi, "video/x-msvideo")
        .when(F.substring(b, 1, 4) == b"RIFF", "audio/wav")
        .otherwise("application/octet-stream")
    )
    long_enough = F.length(b) >= 26
    if jpeg_scan:
        # pre-project the UDF result into a named column (CLAUDE.md rule:
        # never reference a non-trivial subtree twice); only JPEG/MP4
        # prefixes cross Arrow — everything else is NULL. MP4 gets a 256KB
        # prefix (the moov box of a faststart file), JPEG 64KB.
        jd = _jpeg_dims_udf()(
            F.when(is_jpg & long_enough, F.substring(b, 1, 65536))
            .when(is_mp4 & long_enough, F.substring(b, 1, 262144))
            .when(is_avi & long_enough, F.substring(b, 1, 65536))
        )
    else:
        jd = F.lit(None).cast("struct<width:int,height:int>")
    df = df.withColumn("_jpeg_dims", jd)
    jdc = F.col("_jpeg_dims")
    width = (
        F.when(is_png & long_enough, _be_int(b, 17, 4))
        .when(is_gif & long_enough, _le_int16(b, 7))
        .when(is_bmp & long_enough, F.abs(_le_int32_signed(b, 19)))
        .when((is_jpg | is_mp4 | is_avi) & long_enough, jdc.getField("width"))
        .otherwise(F.lit(None).cast("int"))
    )
    # BMP: negative height = top-down row order; pixel height is |biHeight|
    height = (
        F.when(is_png & long_enough, _be_int(b, 21, 4))
        .when(is_gif & long_enough, _le_int16(b, 9))
        .when(is_bmp & long_enough, F.abs(_le_int32_signed(b, 23)))
        .when((is_jpg | is_mp4 | is_avi) & long_enough, jdc.getField("height"))
        .otherwise(F.lit(None).cast("int"))
    )
    return df.withColumn(
        out,
        F.struct(
            mime.alias("mime"),
            width.alias("width"),
            height.alias("height"),
            F.length(b).cast("long").alias("n_bytes"),
            F.sha2(b, 256).alias("sha256"),
        ),
    ).drop("_jpeg_dims")


# --- real BMP codec path (pure numpy, no image libs) ------------------------
#
# BMP (BITMAPINFOHEADER, BI_RGB uncompressed, 24/32 bpp) is fully decodable
# with array arithmetic: fixed-offset header, 4-byte-padded BGR(A) rows,
# bottom-up storage unless biHeight < 0.  Together with decode_png /
# decode_gif below, three codecs are genuinely end-to-end in this
# container — decode → cutout/crop → resize → features → re-encode — while
# JPEG/video decode stays the documented pluggable gap (custom Huffman+DCT
# and inter-frame coders are what cv2/ffmpeg are for).  The reference's
# decode edge is cv2.imread / PIL in vision_seg_cutout_refiner.py:44-72 and
# utils/utils.py:27-50.


def decode_bmp(buf) -> "np.ndarray":
    """Decode an uncompressed (BI_RGB) 24/32-bpp BMP to an (h, w, 3|4) uint8
    RGB(A) array.  Handles row padding to 4 bytes and bottom-up vs top-down
    (negative biHeight) storage.  Raises ValueError on anything else —
    callers surface it per-row, never fail the job."""
    import numpy as np

    b = bytes(buf or b"")
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP unsupported")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    if w <= 0 or h == 0:
        raise ValueError("bad dimensions")
    topdown = h < 0
    h = abs(h)
    nchan = bpp // 8
    stride = (w * nchan + 3) // 4 * 4
    need = pix_off + stride * h
    if need > len(b):
        raise ValueError("truncated pixel data")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=pix_off)
    rows = rows.reshape(h, stride)[:, : w * nchan].reshape(h, w, nchan)
    if not topdown:
        rows = rows[::-1]
    # BGR(A) -> RGB(A)
    out = rows[..., [2, 1, 0]] if nchan == 3 else rows[..., [2, 1, 0, 3]]
    return np.ascontiguousarray(out)


def encode_bmp(img: "np.ndarray") -> bytes:
    """Encode an (h, w, 3|4) uint8 RGB(A) array as an uncompressed
    bottom-up 24/32-bpp BMP (BITMAPINFOHEADER)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, nchan = img.shape
    if nchan not in (3, 4):
        raise ValueError("expected RGB or RGBA")
    bpp = nchan * 8
    stride = (w * nchan + 3) // 4 * 4
    bgr = img[..., [2, 1, 0]] if nchan == 3 else img[..., [2, 1, 0, 3]]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * nchan] = bgr.reshape(h, w * nchan)
    pix = rows[::-1].tobytes()  # bottom-up
    pix_off = 54
    size = pix_off + len(pix)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + pix_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + pix


# --- real PNG codec path (stdlib zlib + numpy, no image libs) ----------------
#
# PNG's "entropy coder" is DEFLATE — Python's stdlib ``zlib`` — so unlike
# JPEG (custom Huffman + DCT) a full, real PNG decode needs no external
# image library: chunk walk → zlib.decompress(IDAT) → per-scanline
# unfiltering (types 0-4 incl. Paeth) → channel expansion.  Scope: 8-bit
# depth, color types 0/2/3/4/6, non-interlaced (Adam7 raises ValueError —
# progressive delivery is a wire-format concern, not a pixel-semantics one).
# Reference decode edge: cv2.imread/PIL in vision_seg_cutout_refiner.py:44-72.


def decode_png(buf) -> "np.ndarray":
    """Decode an 8-bit-depth, non-interlaced PNG (color types 0 gray,
    2 RGB, 3 palette, 4 gray+alpha, 6 RGBA) to an (h, w, 3|4) uint8 RGB(A)
    array.  Real DEFLATE via stdlib zlib; real unfiltering for all five
    scanline filter types.  Raises ValueError on anything else — callers
    surface it per-row, never fail the job."""
    import zlib

    import numpy as np

    b = bytes(buf or b"")
    if len(b) < 8 or b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG unsupported")
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nchan is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if w <= 0 or h <= 0:
        raise ValueError("bad dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from None
    stride = w * nchan
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated pixel data")
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (1 + stride)).reshape(
        h, 1 + stride
    )
    bpp = nchan  # bytes per pixel at depth 8
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up — fully vectorized
            rec = (cur + prior) & 0xFF
        elif ft == 1:  # Sub = per-lane cumulative sum mod 256
            rec = cur.reshape(-1, bpp).cumsum(axis=0) & 0xFF
            rec = rec.reshape(-1)
        else:  # Average(3) / Paeth(4) need the reconstructed left pixel
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                bb = prior[x]
                if ft == 3:
                    rec[x] = (cur[x] + ((a + bb) >> 1)) & 0xFF
                elif ft == 4:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    px = out.reshape(h, w, nchan)
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 6:
        return np.ascontiguousarray(px)
    if ctype == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if ctype == 4:
        gray = np.repeat(px[..., :1], 3, axis=2)
        return np.ascontiguousarray(np.concatenate([gray, px[..., 1:]], axis=2))
    # ctype == 3: palette
    if plte is None or len(plte) % 3:
        raise ValueError("palette PNG without valid PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[..., 0]
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    return np.ascontiguousarray(pal[idx])


def encode_png(img: "np.ndarray") -> bytes:
    """Encode an (h, w, 3|4) uint8 RGB(A) array as an 8-bit non-interlaced
    PNG (color type 2 or 6, filter 0 on every scanline, stdlib zlib)."""
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, nchan = img.shape
    if nchan not in (3, 4):
        raise ValueError("expected RGB or RGBA")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2 if nchan == 3 else 6, 0, 0, 0])
    )
    lines = np.zeros((h, 1 + w * nchan), dtype=np.uint8)
    lines[:, 1:] = img.reshape(h, w * nchan)
    idat = zlib.compress(lines.tobytes())
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


# --- real GIF decode path (pure-Python LZW + numpy, no image libs) -----------


def _gif_lzw_decode(data: bytes, min_code_size: int, n_px: int) -> "np.ndarray":
    """Variable-width LSB-first GIF LZW decode of ``data`` (concatenated
    image sub-blocks) into exactly ``n_px`` palette indices.  Handles clear
    codes, the KwKwK self-reference case, and the 12-bit table cap."""
    import numpy as np

    if not 1 <= min_code_size <= 11:
        # codes are capped at 12 bits by the spec; a mutated header byte
        # here would otherwise size the initial table as 2^255 (DoS)
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < n_px:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_px:
        raise ValueError("LZW stream ended early")
    return np.frombuffer(bytes(out[:n_px]), dtype=np.uint8)


def decode_gif(buf) -> "np.ndarray":
    """Decode the FIRST frame of a GIF87a/89a to an (h, w, 3) uint8 RGB
    array — real variable-width LZW, global or local color table, Adam-style
    4-pass interlace.  Later frames / disposal compositing are out of scope
    (the reference's frame sampling grabs stills).  Raises ValueError on
    malformed input — callers surface it per-row, never fail the job."""
    import numpy as np

    b = bytes(buf or b"")
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    while pos < len(b):
        marker = b[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated image descriptor")
        w = int.from_bytes(b[pos + 4 : pos + 6], "little")
        h = int.from_bytes(b[pos + 6 : pos + 8], "little")
        ipacked = b[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(
                -1, 3
            )
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        if w <= 0 or h <= 0:
            raise ValueError("bad dimensions")
        min_code_size = b[pos]
        pos += 1
        chunks = []
        while pos < len(b) and b[pos] != 0:
            ln = b[pos]
            chunks.append(b[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        idx = _gif_lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            order = np.concatenate(
                [
                    np.arange(0, h, 8),
                    np.arange(4, h, 8),
                    np.arange(2, h, 4),
                    np.arange(1, h, 2),
                ]
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        return np.ascontiguousarray(pal[idx])
    raise ValueError("GIF contains no image")


def decode_image(buf) -> "np.ndarray":
    """Magic-sniffed decode to an (h, w, 3|4) uint8 RGB(A) array — REAL for
    BMP (uncompressed), PNG (all five filters, stdlib-zlib DEFLATE), GIF
    (LZW, first frame) and baseline JPEG (Huffman + vectorized IDCT, see
    ``operators/jpegcodec.py``).  An AVI/MJPEG video decodes to its FIRST
    frame (same convention as multi-frame GIF; full-sequence access is
    ``operators/video.py``).  Inter-frame video codecs stay the documented
    pluggable gap (what ffmpeg is for).  Raises ValueError for that and
    anything malformed."""
    b = bytes(buf or b"")
    try:
        if b[:2] == b"BM":
            return decode_bmp(b)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(b)
        if b[:2] == b"\xff\xd8":
            from dataflow_mm_spark.operators.jpegcodec import decode_jpeg

            return decode_jpeg(b)
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            from dataflow_mm_spark.operators.video import decode_avi

            return decode_avi(b, [0])[0]
    except (IndexError, KeyError) as e:
        # hostile/truncated headers can trip raw byte indexing deep in a
        # parser — normalize to the per-row ValueError contract
        raise ValueError(f"malformed image payload: {e!r}") from None
    raise ValueError(
        "undecodable payload (real codecs: BMP, PNG, GIF, JPEG, AVI/MJPEG)"
    )


def nn_resize(img: "np.ndarray", size: tuple[int, int]) -> "np.ndarray":
    """Nearest-neighbor resize to (out_w, out_h) — pixel-center sampling
    ``src = floor((i + 0.5) * in / out)``, integer-exact as
    ``(2i + 1) * in // (2 * out)`` so cross-engine oracles can replay it."""
    import numpy as np

    out_w, out_h = size
    h, w = img.shape[:2]
    iy = (2 * np.arange(out_h) + 1) * h // (2 * out_h)
    ix = (2 * np.arange(out_w) + 1) * w // (2 * out_w)
    return img[iy][:, ix]


def cutout_bbox(img: "np.ndarray", x0: int, y0: int, x1: int, y1: int) -> "np.ndarray":
    """Seg-cutout with a rectangular mask (VisionSegCutoutRefiner:53-69
    analogue — the YOLO mask is the pluggable serving stage; the mask
    APPLICATION is this): RGBA output, selected pixels keep RGB and get
    alpha 255, everything else zeroed — same canvas size as the input,
    exactly the reference's ``np.zeros((h,w,4)); output[sel]=...``."""
    import numpy as np

    h, w = img.shape[:2]
    out = np.zeros((h, w, 4), dtype=np.uint8)
    x0, y0 = max(0, x0), max(0, y0)
    x1, y1 = min(w, x1), min(h, y1)
    if x1 > x0 and y1 > y0:
        out[y0:y1, x0:x1, :3] = img[y0:y1, x0:x1, :3]
        out[y0:y1, x0:x1, 3] = 255
    return out


def seg_cutout(
    df: DataFrame,
    bin_col: str = "payload",
    bbox_cols: tuple[str, str, str, str] = ("x0", "y0", "x1", "y1"),
    id_cols: tuple[str, ...] = ("doc_id",),
    out_col: str = "cutout",
) -> DataFrame:
    """VisionSegCutoutRefiner re-expressed: decode (real for BMP/PNG/GIF via
    ``decode_image``) → apply the mask (bbox columns standing in for the
    serving-side seg mask) → re-encode RGBA.  Output: id cols + ``cutout
    binary`` (32-bpp BMP) + ``error``."""
    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = f"{ids_schema}, {out_col} binary, error string"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs, errs = [], []
            for r in pdf.itertuples():
                try:
                    img = decode_image(getattr(r, bin_col))
                    x0, y0, x1, y1 = (int(getattr(r, c)) for c in bbox_cols)
                    outs.append(encode_bmp(cutout_bbox(img, x0, y0, x1, y1)))
                    errs.append(None)
                except ValueError as e:
                    outs.append(None)
                    errs.append(str(e))
            out = pdf[list(id_cols)].copy()
            out[out_col] = outs
            out["error"] = errs
            yield out

    return df.mapInPandas(gen, schema)


def luminance_stats(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """VideoLuminanceEvaluator analogue over the REAL codec path: decode
    (BMP/PNG/GIF via ``decode_image``) and aggregate Rec.601 luma — integer milli-coefficients
    ``Y₁₀₀₀ = 299·R + 587·G + 114·B`` summed exactly in int64, so callers
    compute ``mean_luma = lum_millisum / (1000 · n_px)`` and gates can
    replay the sum closed-form.  Per-row error capture; non-BMP payloads
    report the codec gap instead of failing the job."""
    import numpy as np

    dts = dict(df.dtypes)
    ids_schema = ", ".join(f"{c} {dts[c]}" for c in id_cols)
    schema = f"{ids_schema}, lum_millisum bigint, n_px bigint, error string"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sums, npx, errs = [], [], []
            for payload in pdf[bin_col]:
                try:
                    img = decode_image(payload).astype(np.int64)
                    y = (
                        299 * img[..., 0]
                        + 587 * img[..., 1]
                        + 114 * img[..., 2]
                    )
                    sums.append(int(y.sum()))
                    npx.append(int(img.shape[0] * img.shape[1]))
                    errs.append(None)
                except ValueError as e:
                    sums.append(None)
                    npx.append(None)
                    errs.append(str(e))
            out = pdf[list(id_cols)].copy()
            out["lum_millisum"] = pd.array(sums, dtype="Int64")
            out["n_px"] = pd.array(npx, dtype="Int64")
            out["error"] = errs
            yield out

    return df.mapInPandas(gen, schema)


def decode_and_featurize(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
    resize_to: tuple[int, int] = (224, 224),
    fake: bool = False,
) -> DataFrame:
    """Decode → resize → feature-extract, Arrow-batched.  REAL for BMP, PNG
    and GIF payloads (``decode_image`` + nearest-neighbor resize; feature =
    per-channel means of the resized image, scaled to [0,1]).  JPEG/video
    need cv2/ffmpeg — absent here — so they raise NotImplementedError
    unless ``fake=True``, which derives a deterministic 8-dim feature from
    the payload hash so downstream plumbing (schema, batching, joins)
    stays testable for every format."""
    ids = ", ".join(f"{c} long" for c in id_cols)
    schema = f"{ids}, width int, height int, feature array<float>"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                payload: bytes = getattr(r, bin_col) or b""
                real_magic = (
                    payload[:2] == b"BM"
                    or payload[:8] == b"\x89PNG\r\n\x1a\n"
                    or payload[:6] in (b"GIF87a", b"GIF89a")
                    or payload[:2] == b"\xff\xd8"
                    or (payload[:4] == b"RIFF" and payload[8:12] == b"AVI ")
                )
                if real_magic and not fake:
                    try:
                        img = decode_image(payload)
                    except ValueError:
                        # malformed real-codec payload: per-row NULLs,
                        # never a job failure (decode_image's contract)
                        rows.append(
                            [*[getattr(r, c) for c in id_cols], None, None, None]
                        )
                        continue
                    h, w = img.shape[:2]
                    small = nn_resize(img[..., :3], resize_to)
                    feat = [
                        float(m) / 255.0
                        for m in small.reshape(-1, 3).mean(axis=0)
                    ]
                    rows.append([*[getattr(r, c) for c in id_cols], w, h, feat])
                    continue
                if not fake:
                    raise NotImplementedError(
                        "inter-frame video decode requires ffmpeg — not "
                        "available in this container (BMP/PNG/GIF/JPEG and "
                        "AVI/MJPEG decode is real); pass fake=True for the "
                        "deterministic stub"
                    )
                hsh = hashlib.sha256(payload).digest()
                feat = [b / 255.0 for b in hsh[:8]]
                rows.append(
                    [*[getattr(r, c) for c in id_cols], *resize_to, feat]
                )
            yield pd.DataFrame(
                rows, columns=[*id_cols, "width", "height", "feature"]
            )

    return df.mapInPandas(gen, schema)


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_sec",
    fps_col: str = "fps",
    interval_sec: float = 1.0,
) -> DataFrame:
    """Frame-sampling plan (VideoFrameFilter semantics): one row per sampled
    frame index — pure Spark; the actual frame grab is the stubbed decode."""
    n = F.floor(F.col(duration_col) / interval_sec).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n, F.lit(0))),
        lambda i: F.floor(i * F.lit(interval_sec) * F.col(fps_col)).cast("long"),
    )
    return df.select("*", F.explode(frames).alias("frame_idx"))
