"""Unit tests for the dependency-free 24-bit BMP codec
(operators/multimodal.py::encode_bmp / decode_bmp) — the REAL half of the
multimodal surface. The end-to-end Spark query is hash-checked by
tests/test_oracle_parity.py::multimodal_bmp_decode; these pin the codec's
standard conformance directly."""

from __future__ import annotations

import numpy as np
import pytest

from stock_market_big_data_project_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (16, 9)])
def test_roundtrip_identity(w, h):
    """decode(encode(x)) == x for every row-padding residue (w mod 4)."""
    rng = np.random.default_rng(w * 100 + h)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_known_bytes_layout():
    """Hand-check the DIB layout: 2×2 image, bottom-up BGR rows padded to
    4 bytes — the bytes are written out longhand, no codec involved."""
    arr = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    payload = encode_bmp(arr)
    assert payload[:2] == b"BM"
    assert int.from_bytes(payload[10:14], "little") == 54
    assert int.from_bytes(payload[18:22], "little") == 2
    assert int.from_bytes(payload[22:26], "little") == 2
    assert int.from_bytes(payload[28:30], "little") == 24
    # stride = 8 (2*3 rounded up); bottom row first, BGR order
    data = payload[54:]
    assert len(data) == 16
    assert data[:8] == bytes([9, 8, 7, 12, 11, 10, 0, 0])
    assert data[8:] == bytes([3, 2, 1, 6, 5, 4, 0, 0])


def test_top_down_variant_decodes():
    """Negative height = top-down row order (valid BMP we don't emit but
    must read)."""
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = bytearray(encode_bmp(arr[::-1]))  # flip rows, then mark
    payload[22:26] = (-2).to_bytes(4, "little", signed=True)  # top-down
    assert np.array_equal(decode_bmp(bytes(payload)), arr[::-1][::-1])


def test_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG....")
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(encode_bmp(arr))
    payload[30:34] = (1).to_bytes(4, "little")  # BI_RLE8 compression
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(payload))
