"""Unit tests for the dependency-free PNG codec
(operators/png.py::encode_png / decode_png) — stdlib zlib inflate + numpy
unfilter, the second REAL image codec after BMP. The end-to-end Spark
query is hash-checked by tests/test_oracle_parity.py::multimodal_png_decode;
these pin the codec's standard conformance directly, including a
filter-by-filter differential against a byte-at-a-time pure-Python
unfilter implementation written straight from the PNG spec recurrences."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from stock_market_big_data_project_spark.operators.png import (
    _png_fixture_pixels,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (2, 3), (9, 8), (16, 13)])
@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_identity(w, h, channels):
    """decode(encode(x)) == x for grey + RGB across widths incl. w=1
    (degenerate left-neighbour case for Sub/Average/Paeth)."""
    rng = np.random.default_rng(w * 1000 + h * 10 + channels)
    shape = (h, w) if channels == 1 else (h, w, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(arr))
    assert back.shape == arr.shape
    assert np.array_equal(back, arr)


def _ref_unfilter(payload: bytes):
    """Independent byte-at-a-time unfilter, written directly from the PNG
    spec's Recon(x) recurrences — no numpy, no shared code with decode_png
    beyond the chunk walk."""
    pos = 8
    ihdr, idat = None, b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        pos += 12 + length
    w, h, _, colour, _, _, _ = ihdr
    bpp = 3 if colour == 2 else 1
    stride = w * bpp
    raw = zlib.decompress(idat)
    out = []
    prev = [0] * stride
    for y in range(h):
        row = raw[y * (1 + stride) : (y + 1) * (1 + stride)]
        f, cur = row[0], list(row[1:])
        rec = [0] * stride
        for i in range(stride):
            a = rec[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            rec[i] = (cur[i] + pred) % 256
        out.append(rec)
        prev = rec
    arr = np.array(out, dtype=np.uint8)
    return arr.reshape(h, w, 3) if colour == 2 else arr.reshape(h, w)


@pytest.mark.parametrize("channels", [1, 3])
def test_unfilter_differential_vs_spec_reference(channels):
    """The numpy unfilter == the spec-literal pure-Python unfilter, byte
    for byte, on an image tall enough that every filter type (the encoder
    cycles y % 5) appears at least twice."""
    rng = np.random.default_rng(42 + channels)
    shape = (11, 7) if channels == 1 else (11, 7, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    payload = encode_png(arr)
    assert np.array_equal(decode_png(payload), _ref_unfilter(payload))


def test_every_filter_type_is_emitted():
    """The encoder's y % 5 cycling really puts all five filter types in
    the stream (otherwise the unfilter tests prove less than claimed)."""
    payload = encode_png(np.zeros((10, 4), dtype=np.uint8))
    pos = 8
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        if payload[pos + 4 : pos + 8] == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    ftypes = {raw[y * 5] for y in range(10)}  # stride 4 + 1 filter byte
    assert ftypes == {0, 1, 2, 3, 4}


def test_multi_idat_reassembly():
    """Payloads > 64 compressed bytes split IDAT in two; both decode."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_png(arr)
    n_idat = payload.count(b"IDAT")
    assert n_idat == 2
    assert np.array_equal(decode_png(payload), arr)


def test_rejects_corruption_and_unsupported():
    arr = np.zeros((4, 4), dtype=np.uint8)
    payload = bytearray(encode_png(arr))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + bytes(payload)[2:])
    flipped = bytearray(payload)
    flipped[20] ^= 0xFF  # inside IHDR data -> CRC mismatch
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(flipped))
    # 16-bit depth: rewrite IHDR depth byte AND fix its CRC, so the
    # variant gate (not the CRC) does the rejecting
    ihdr = bytearray(payload[16:29])
    ihdr[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    deep = payload[:16] + bytes(ihdr) + struct.pack(">I", crc) + payload[33:]
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(deep))


def test_fixture_pixels_match_formulas_and_roundtrip():
    """The fixture generator follows the documented (doc_id, x, y) integer
    formulas (the oracle's contract) and roundtrips through the codec."""
    for doc_id in range(12):
        px = _png_fixture_pixels(doc_id)
        w = 8 + (doc_id * 5) % 9
        h = 8 + (doc_id * 7) % 6
        if doc_id % 2 == 0:
            assert px.shape == (h, w, 3)
            assert px[2, 3, 0] == (2 * doc_id + 11 * 3 + 3 * 2) % 256
            assert px[2, 3, 1] == (7 * doc_id + 3 + 5 * 2) % 256
            assert px[2, 3, 2] == (doc_id + 9 * 3 + 2 * 2) % 256
        else:
            assert px.shape == (h, w)
            assert px[2, 3] == (9 * doc_id + 5 * 3 + 7 * 2) % 256
        assert np.array_equal(decode_png(encode_png(px)), px)
