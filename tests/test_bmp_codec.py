"""Real BMP codec path: decode/encode round-trip, NN resize, seg-cutout mask
application, and the real decode_and_featurize branch."""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_mm_spark.operators import multimodal as MM


def _rand_img(rng, h, w, nchan):
    return rng.integers(0, 256, size=(h, w, nchan), dtype=np.uint8)


def test_bmp_roundtrip_all_paddings():
    rng = np.random.default_rng(5)
    for nchan in (3, 4):
        for w in range(1, 9):  # covers every row-padding remainder
            for h in (1, 2, 5):
                img = _rand_img(rng, h, w, nchan)
                out = MM.decode_bmp(MM.encode_bmp(img))
                assert out.shape == (h, w, nchan)
                assert np.array_equal(out, img)


def test_bmp_topdown_decode():
    rng = np.random.default_rng(6)
    img = _rand_img(rng, 4, 5, 3)
    buf = bytearray(MM.encode_bmp(img))
    # flip to top-down: negate biHeight and reverse the stored row order
    stride = (5 * 3 + 3) // 4 * 4
    buf[22:26] = (-4).to_bytes(4, "little", signed=True)
    pix = bytes(buf[54:])
    rows = [pix[i * stride : (i + 1) * stride] for i in range(4)]
    buf[54:] = b"".join(reversed(rows))
    out = MM.decode_bmp(bytes(buf))
    assert np.array_equal(out, img)


def test_bmp_decode_rejects():
    img = _rand_img(np.random.default_rng(7), 3, 3, 3)
    good = bytearray(MM.encode_bmp(img))
    with pytest.raises(ValueError):
        MM.decode_bmp(b"")
    with pytest.raises(ValueError):
        MM.decode_bmp(b"BM" + bytes(40))  # too short
    rle = bytearray(good)
    rle[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError):
        MM.decode_bmp(bytes(rle))
    pal = bytearray(good)
    pal[28:30] = (8).to_bytes(2, "little")  # palettized
    with pytest.raises(ValueError):
        MM.decode_bmp(bytes(pal))
    with pytest.raises(ValueError):
        MM.decode_bmp(bytes(good[:-1]))  # truncated pixels


def test_nn_resize_pixel_center():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = MM.nn_resize(img, (2, 3))  # (out_w=2, out_h=3)
    assert out.shape == (3, 2, 3)
    iy = [(2 * i + 1) * 6 // 6 for i in range(3)]
    ix = [(2 * i + 1) * 4 // 4 for i in range(2)]
    for a, y in enumerate(iy):
        for b, x in enumerate(ix):
            assert np.array_equal(out[a, b], img[y, x])
    # upscale keeps values from the source grid
    up = MM.nn_resize(img, (8, 12))
    assert up.shape == (12, 8, 3)
    assert set(up.reshape(-1).tolist()) <= set(img.reshape(-1).tolist())


def test_cutout_bbox_mask_and_clip():
    img = np.full((4, 5, 3), 9, dtype=np.uint8)
    out = MM.cutout_bbox(img, 1, 2, 3, 4)
    assert out.shape == (4, 5, 4)
    assert out[2:4, 1:3, 3].min() == 255 and out[2:4, 1:3, :3].min() == 9
    sel = np.zeros((4, 5), dtype=bool)
    sel[2:4, 1:3] = True
    assert out[~sel].max() == 0
    # clipping + empty boxes
    assert MM.cutout_bbox(img, -5, -5, 99, 99)[..., 3].min() == 255
    assert MM.cutout_bbox(img, 3, 3, 3, 9).max() == 0


def test_decode_and_featurize_real_bmp(spark):
    rng = np.random.default_rng(8)
    img1 = _rand_img(rng, 6, 7, 3)
    img2 = _rand_img(rng, 3, 3, 3)
    df = spark.createDataFrame(
        [(1, MM.encode_bmp(img1)), (2, MM.encode_bmp(img2))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in MM.decode_and_featurize(df, resize_to=(4, 4)).collect()
    }
    assert (rows[1].width, rows[1].height) == (7, 6)
    small = MM.nn_resize(img1, (4, 4)).reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(rows[1].feature, small, atol=1e-6)
    # video/unknown magic without fake → job-level NotImplementedError
    bad = spark.createDataFrame(
        [(3, b"\x00\x00\x00 ftypisom video" * 8)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        MM.decode_and_featurize(bad).collect()
    assert "ffmpeg" in str(ei.value)
    # a real-codec magic with a malformed body → per-row NULLs, job survives
    mangled = spark.createDataFrame(
        [
            (4, b"\x89PNG\r\n\x1a\n garbage"),
            (5, b"\xff\xd8\xff\xe0 not really a jpeg"),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in MM.decode_and_featurize(mangled).collect()}
    assert got[4].width is None and got[4].feature is None
    assert got[5].width is None and got[5].feature is None


def test_seg_cutout_spark_roundtrip(spark):
    rng = np.random.default_rng(9)
    imgs = {i: _rand_img(rng, 5 + i, 6 + i, 3) for i in range(3)}
    df = spark.createDataFrame(
        [
            (i, MM.encode_bmp(imgs[i]), 1, 1, 4, 3 + i)
            for i in range(3)
        ]
        + [(9, b"not a bmp at all pad pad pad pad pad pad pad pad pad pad", 0, 0, 1, 1)],
        "doc_id long, payload binary, x0 int, y0 int, x1 int, y1 int",
    )
    rows = {r.doc_id: r for r in MM.seg_cutout(df).collect()}
    assert rows[9].cutout is None and "BMP" in rows[9].error
    for i in range(3):
        assert rows[i].error is None
        got = MM.decode_bmp(rows[i].cutout)
        want = MM.cutout_bbox(imgs[i], 1, 1, 4, 3 + i)
        assert np.array_equal(got, want)


def test_luminance_stats(spark):
    rng = np.random.default_rng(11)
    img = _rand_img(rng, 5, 6, 3)
    df = spark.createDataFrame(
        [(1, MM.encode_bmp(img)), (2, b"junk" * 20)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in MM.luminance_stats(df).collect()}
    y = (
        299 * img[..., 0].astype(np.int64)
        + 587 * img[..., 1].astype(np.int64)
        + 114 * img[..., 2].astype(np.int64)
    )
    assert rows[1].error is None
    assert rows[1].lum_millisum == int(y.sum()) and rows[1].n_px == 30
    assert rows[2].lum_millisum is None and rows[2].error


def test_decode_and_featurize_malformed_bm_prefix(spark):
    rng = np.random.default_rng(12)
    good = MM.encode_bmp(_rand_img(rng, 3, 3, 3))
    df = spark.createDataFrame(
        [(1, good), (2, b"BM" + b"\x00" * 20)],  # truncated BM payload
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in MM.decode_and_featurize(df).collect()}
    assert rows[1].width == 3 and rows[1].feature is not None
    assert rows[2].width is None and rows[2].feature is None  # per-row NULL
