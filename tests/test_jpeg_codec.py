"""Real baseline JPEG decode (operators/jpegcodec.py).

Independence structure: the separable vectorized IDCT is cross-checked
against a naive O(64^2) cosine-sum IDCT written here; the entropy layer is
proven lossless by driving CHOSEN coefficient blocks through encode →
decode; constant-block exactness (the DuckDB-gate contract) is checked
against the closed-form integer color chain."""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_mm_spark.operators import jpegcodec as J
from dataflow_mm_spark.operators import multimodal as MM


def _block_constant_img(rng, h, w):
    bh, bw = -(-h // 8), -(-w // 8)
    cols = rng.integers(0, 256, size=(bh, bw, 3), dtype=np.uint8)
    return np.repeat(np.repeat(cols, 8, axis=0), 8, axis=1)[:h, :w]


def test_idct_separable_matches_naive():
    rng = np.random.default_rng(31)
    coef = rng.integers(-512, 512, size=(5, 8, 8)).astype(np.float64)
    fast = J.idct2_blocks(coef)
    for i in range(5):
        naive = J.idct2_naive(coef[i])
        assert np.allclose(fast[i], naive, atol=1e-9)


def test_fdct_idct_inverse_pair():
    rng = np.random.default_rng(32)
    x = rng.uniform(-128, 127, size=(4, 8, 8))
    back = J.idct2_blocks(J.fdct2_blocks(x))
    assert np.allclose(back, x, atol=1e-9)


def test_color_convert_integer_chain_bounds():
    # every 8-bit RGB corner plus random: outputs in range, chain stable
    rng = np.random.default_rng(33)
    pts = np.array(
        [[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
        dtype=np.uint8,
    ).reshape(1, 5, 3)
    rand = rng.integers(0, 256, size=(1, 500, 3), dtype=np.uint8)
    for rgb in (pts, rand):
        ycc = J.rgb_to_ycc_int(rgb)
        rgb2 = J.ycc_to_rgb_int(ycc)
        # the rounded chain is within 2 of the original everywhere
        assert np.abs(rgb2.astype(int) - rgb.astype(int)).max() <= 2
        # and idempotent from the second pass on (fixed point)
        assert np.array_equal(J.ycc_to_rgb_int(J.rgb_to_ycc_int(rgb2)), rgb2)


def test_constant_block_exact_all_quants():
    rng = np.random.default_rng(34)
    for q in (1, 2, 4, 8):
        for (h, w) in [(8, 8), (16, 16), (12, 10), (5, 7), (8, 24)]:
            img = _block_constant_img(rng, h, w)
            out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=q, quant_chroma=q))
            exp = J.ycc_to_rgb_int(J.rgb_to_ycc_int(img))
            assert out.shape == img.shape
            assert np.array_equal(out, exp), (q, h, w)


def test_constant_macroblock_420_exact():
    rng = np.random.default_rng(35)
    cols = rng.integers(0, 256, size=(3, 2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(cols, 16, axis=0), 16, axis=1)
    out = J.decode_jpeg(J.encode_jpeg(img, subsample="420", quant_luma=8, quant_chroma=4))
    exp = J.ycc_to_rgb_int(J.rgb_to_ycc_int(img))
    assert np.array_equal(out, exp)


def test_restart_markers_reset_dc():
    rng = np.random.default_rng(36)
    img = _block_constant_img(rng, 24, 24)
    plain = J.decode_jpeg(J.encode_jpeg(img))
    with_rst = J.decode_jpeg(J.encode_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_entropy_layer_lossless_on_chosen_coefficients():
    """encode(coefficients=...) → decode reproduces the exact quantized
    coefficients through dequant q=1 + IDCT: feed DC-only and sparse-AC
    blocks whose IDCT is analytically known."""
    rng = np.random.default_rng(37)
    # random sparse coefficient blocks, values in JPEG's representable range
    nby = nbx = 2
    blocks = np.zeros((3, nby, nbx, 8, 8), dtype=np.int64)
    for ci in range(3):
        for by in range(nby):
            for bx in range(nbx):
                blk = np.zeros(64, dtype=np.int64)
                nz = rng.integers(1, 12)
                idx = rng.choice(64, size=nz, replace=False)
                blk[idx] = rng.integers(-255, 256, size=nz)
                blocks[ci, by, bx] = blk.reshape(8, 8)
    coefficients = {ci: (nby, nbx, blocks[ci]) for ci in range(3)}
    buf = J.encode_jpeg(
        np.zeros((16, 16, 3), np.uint8), coefficients=coefficients
    )
    out = J.decode_jpeg(buf)
    # replay the decoder's math on the KNOWN coefficients
    planes = []
    for ci in range(3):
        spat = J.idct2_blocks(blocks[ci].reshape(-1, 8, 8).astype(np.float64)) + 128.0
        grid = spat.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(16, 16)
        planes.append(np.clip(np.floor(grid + 0.5), 0, 255).astype(np.uint8))
    exp = J.ycc_to_rgb_int(np.stack(planes, axis=-1))
    assert np.array_equal(out, exp)


def test_general_roundtrip_q1_tolerance():
    rng = np.random.default_rng(38)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(img, quant_luma=1, quant_chroma=1))
    exp = J.ycc_to_rgb_int(J.rgb_to_ycc_int(img))
    # AC quantization rounds each coefficient by ≤0.5 → small pixel error
    assert np.abs(out.astype(int) - exp.astype(int)).max() <= 4


def test_decode_rejects():
    rng = np.random.default_rng(39)
    good = J.encode_jpeg(_block_constant_img(rng, 8, 8))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"")
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\xff\xd8\xff")
    # progressive SOF2
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(prog))
    # 12-bit precision
    deep = bytearray(good)
    deep[i + 4] = 12
    with pytest.raises(ValueError):
        J.decode_jpeg(bytes(deep))
    # truncated entropy data
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:-8])


def test_decode_image_dispatches_jpeg():
    rng = np.random.default_rng(40)
    img = _block_constant_img(rng, 8, 16)
    out = MM.decode_image(J.encode_jpeg(img))
    exp = J.ycc_to_rgb_int(J.rgb_to_ycc_int(img))
    assert np.array_equal(out, exp)
    # malformed jpeg magic → ValueError, not IndexError
    with pytest.raises(ValueError):
        MM.decode_image(b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02")


def test_asset_meta_dims_agree_with_real_decode(spark):
    """with_asset_meta's bounded SOF walk and the full decoder agree on
    dimensions for real encoder output."""
    rng = np.random.default_rng(41)
    img = _block_constant_img(rng, 13, 21)
    buf = J.encode_jpeg(img)
    df = spark.createDataFrame([(1, buf)], "doc_id long, payload binary")
    meta = MM.with_asset_meta(df, "payload").select("meta.width", "meta.height").first()
    assert (meta.width, meta.height) == (21, 13)
    assert J.decode_jpeg(buf).shape[:2] == (13, 21)
