"""Unit tests for the dependency-free baseline JPEG codec
(operators/jpeg.py) — the fifth and last REAL modality codec. The
end-to-end Spark query (`multimodal_jpeg_decode`) is hash-checked by
test_oracle_parity; these pin the codec directly: the bitstream path must
reproduce the pure-math replay bit for bit (Huffman, stuffing, DC
prediction are load-bearing), fidelity must behave like JPEG (near-exact
on smooth content), and the variant gates must reject what the decoder
cannot honour."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stock_market_big_data_project_spark.operators.jpeg import (
    _jpeg_fixture_pixels,
    decode_jpeg,
    encode_jpeg,
    reconstruct_pixels,
)


@pytest.mark.parametrize(
    "shape", [(8, 8), (16, 8), (8, 16, 3), (16, 16, 3), (24, 32), (32, 24, 3)]
)
def test_bitstream_reproduces_math_replay(shape):
    """decode(encode(x)) == reconstruct_pixels(x) EXACTLY: the Huffman
    bitstream, byte stuffing, and DC prediction add nothing and lose
    nothing relative to the codec's specified lossy arithmetic."""
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(px)), reconstruct_pixels(px))


def test_fidelity_on_smooth_and_flat_content():
    y, x = np.mgrid[0:16, 0:16]
    smooth = (100 + 3 * x + 2 * y).astype(np.uint8)
    err = np.abs(
        decode_jpeg(encode_jpeg(smooth)).astype(int) - smooth.astype(int)
    )
    assert err.max() <= 3
    flat = np.full((8, 8), 137, dtype=np.uint8)
    assert (
        np.abs(decode_jpeg(encode_jpeg(flat)).astype(int) - 137).max() <= 1
    )
    rgb = np.stack(
        [(80 + 2 * x + y) % 200, (60 + x + 2 * y) % 200, (90 + x + y) % 200],
        axis=2,
    ).astype(np.uint8)
    err = np.abs(decode_jpeg(encode_jpeg(rgb)).astype(int) - rgb.astype(int))
    assert err.max() <= 8  # chroma quantization is coarser, by design


def test_marker_structure_and_compression():
    px = _jpeg_fixture_pixels(0)  # 16×16 RGB
    p = encode_jpeg(px)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in p[:32]
    assert p.count(b"\xff\xdb") >= 2  # luma + chroma DQT
    sof = p.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack(">BHHB", p[sof + 4 : sof + 10])
    assert (prec, h, w, nc) == (8, 16, 16, 3)
    # flat content compresses far below raw size
    flat = encode_jpeg(np.full((64, 64), 128, dtype=np.uint8))
    assert len(flat) < 64 * 64 // 4


def test_dc_prediction_across_blocks():
    """Blocks with very different means — wrong DC prediction would shift
    whole blocks, which the math-replay equality would catch loudly."""
    px = np.zeros((8, 32), dtype=np.uint8)
    for b, v in enumerate((10, 240, 60, 180)):
        px[:, b * 8 : (b + 1) * 8] = v
    dec = decode_jpeg(encode_jpeg(px))
    assert np.array_equal(dec, reconstruct_pixels(px))
    for b, v in enumerate((10, 240, 60, 180)):
        assert abs(int(dec[4, b * 8 + 4]) - v) <= 2


def test_byte_stuffing_roundtrip():
    """An image whose entropy stream contains stuffed 0xFF bytes still
    decodes exactly (search a few seeds to guarantee one appears)."""
    rng = np.random.default_rng(0)
    found = False
    for _ in range(40):
        px = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        p = encode_jpeg(px)
        sos = p.index(b"\xff\xda")
        scan = p[sos + 2 :]
        if b"\xff\x00" in scan[:-2]:
            found = True
            assert np.array_equal(decode_jpeg(p), reconstruct_pixels(px))
    assert found, "no stuffed byte occurred in 40 random images"


def test_rejects_non_jpeg_and_unsupported_variants():
    px = np.zeros((8, 8), dtype=np.uint8)
    p = encode_jpeg(px)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG" + p[4:])
    prog = p.replace(b"\xff\xc0", b"\xff\xc2")  # progressive SOF
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    sof = p.index(b"\xff\xc0")
    deep = bytearray(p)
    deep[sof + 4] = 12  # 12-bit precision
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(deep))
    sub = bytearray(p)
    sub[sof + 11] = 0x22  # 4:2:0 sampling for component 1
    with pytest.raises(ValueError, match="4:4:4"):
        decode_jpeg(bytes(sub))


def test_fixture_formulas_and_dims():
    for d in range(8):
        px = _jpeg_fixture_pixels(d)
        side = 16 if d % 4 == 0 else 8
        if d % 2 == 0:
            assert px.shape == (side, side, 3)
            assert px[2, 3, 0] == 16 + (3 * d) % 32 + 2 * 3 + 3 * 2 + (6 + d) % 48
        else:
            assert px.shape == (side, side)
            assert px[2, 3] == 20 + (13 * d) % 40 + 3 * 3 + 2 * 2 + (6 + d) % 52
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px)), reconstruct_pixels(px)
        )
