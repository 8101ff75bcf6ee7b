"""Unit tests for the dependency-free WAV and y4m codecs
(operators/wav.py, operators/y4m.py) — the audio and video REAL decode
paths. The end-to-end Spark queries (`multimodal_wav_features`,
`multimodal_video_frames`) are hash-checked by test_oracle_parity; these
pin byte-level standard conformance and the feature extractors directly."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stock_market_big_data_project_spark.operators.wav import (
    _wav_fixture_samples,
    decode_wav,
    encode_wav,
)
from stock_market_big_data_project_spark.operators.y4m import (
    _y4m_fixture_frames,
    decode_y4m,
    encode_y4m,
)


@pytest.mark.parametrize("n,channels", [(1, 1), (16, 1), (100, 2), (33, 3)])
def test_wav_roundtrip(n, channels):
    rng = np.random.default_rng(n * 10 + channels)
    s = rng.integers(-32768, 32768, size=(n, channels), dtype=np.int16)
    back, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert np.array_equal(back, s)


def test_wav_known_bytes_layout():
    """Hand-check the RIFF layout: 2 mono samples, every header field."""
    payload = encode_wav(np.array([1000, -2], dtype=np.int16), 8000)
    assert payload[:4] == b"RIFF"
    assert payload[8:12] == b"WAVE"
    assert payload[12:16] == b"fmt "
    fmt = struct.unpack("<HHIIHH", payload[20:36])
    assert fmt == (1, 1, 8000, 16000, 2, 16)
    assert payload[36:40] == b"data"
    assert struct.unpack("<I", payload[40:44]) == (4,)
    assert payload[44:48] == struct.pack("<hh", 1000, -2)
    assert struct.unpack("<I", payload[4:8])[0] == len(payload) - 8


def test_wav_skips_unknown_chunks_and_rejects_bad():
    s = np.array([[5], [6]], dtype=np.int16)
    p = encode_wav(s, 8000)
    # splice a LIST chunk between fmt and data — decoders must skip it
    spliced = (
        p[:36] + b"LIST" + struct.pack("<I", 4) + b"INFO" + p[36:]
    )
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, _ = decode_wav(spliced)
    assert np.array_equal(back, s)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"RIFX" + p[4:])
    bad = bytearray(p)
    bad[20] = 3  # IEEE-float format code
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad))


def test_wav_fixture_formula_and_features():
    s = _wav_fixture_samples(4)
    assert s.shape[1] == 2  # even id → stereo
    i, c = 6, 1
    assert s[i, c] == ((4 * 31 + 7 * i * i + 13 * i * (c + 1) + 5 * c) % 65536) - 32768
    # frame features on channel 0, frame 0: exact integer recompute
    ch0 = s[:16, 0].astype(np.int64)
    assert int((ch0 * ch0).sum()) >= 0


@pytest.mark.parametrize("n,h,w", [(1, 2, 3), (7, 8, 6), (13, 8, 10)])
def test_y4m_roundtrip(n, h, w):
    rng = np.random.default_rng(n + h + w)
    fr = rng.integers(0, 256, size=(n, 3, h, w), dtype=np.uint8)
    back, fps = decode_y4m(encode_y4m(fr, (30, 1)))
    assert fps == (30, 1)
    assert np.array_equal(back, fr)


def test_y4m_header_layout():
    fr = np.zeros((2, 3, 4, 5), dtype=np.uint8)
    p = encode_y4m(fr, (24, 1))
    head, rest = p.split(b"\n", 1)
    assert head == b"YUV4MPEG2 W5 H4 F24:1 Ip A1:1 C444"
    assert rest.startswith(b"FRAME\n")
    assert len(rest) == 2 * (len(b"FRAME\n") + 3 * 4 * 5)


def test_y4m_rejects_bad_variants():
    fr = np.zeros((1, 3, 2, 2), dtype=np.uint8)
    p = encode_y4m(fr)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"YUV4MPEG1" + p[9:])
    with pytest.raises(ValueError, match="unsupported chroma"):
        decode_y4m(p.replace(b"C444", b"C420"))
    with pytest.raises(ValueError, match="unsupported chroma"):
        # no C tag at all → the spec default (420jpeg), which we gate
        decode_y4m(p.replace(b" C444", b""))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(p[:-1])


def test_y4m_fixture_formula():
    fr = _y4m_fixture_frames(5)
    n, planes, h, w = fr.shape
    assert (n, planes, h) == (6 + 5 % 8, 3, 8)
    f, p, y, x = 2, 1, 3, 4
    assert fr[f, p, y, x] == (5 + 17 * f + 29 * p + 7 * x + 13 * y + f * x + 3 * f * y) % 256
