"""Perceptual image hashing — dHash + banded Hamming near-dup (r9).

Extends the dedup family to the image modality (VERDICT r8 #4): the
difference hash (dHash — integer gradient signs on a block-mean-downsampled
luma grid) is the classic perceptual fingerprint for near-duplicate image
detection, and its 64-bit output drops straight into the SimHash machinery
(operators/dedup.py::simhash_hamming_pairs — banded pigeonhole equi-join,
exact-Hamming verify), so candidate pair space is Σ|bucket|², never
corpus².

Everything is integer arithmetic — luma, block means (floor division),
gradient comparisons, bit packing — so the whole chain is relational: the
DuckDB oracle recomputes the hash from the fixture's pixel formulas and
the query is hash-certified end to end, decoder included (the fixture
payloads are REAL PNG files; the dHash runs on genuinely decoded pixels).

The planted structure the fixture carries: docs group by ``doc_id // 4``;
within a group, variants differ by a UNIFORM brightness shift (+16·k per
channel, wrap-free by construction). Block means shift by exactly the same
constant (floor((s + v·n)/n) = floor(s/n) + v), so gradient signs — and
therefore the dHash — are bit-identical across a group: brightness-shifted
copies are hamming-0 near-dups, which is precisely the invariance
perceptual hashing exists to provide (and what byte-level dedup can never
see — the PNG payloads of two variants share no bytes).

At 100 TB: hashing is a narrow Arrow stage fused with the decode pass
(64 bits per image out, payload bytes never shuffle), and the banded join
is the SimHash shape — 4 equi-join buckets per image, verify ∝ candidates.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .spread import spread_keys

from .png import decode_png, encode_png

__all__ = [
    "dhash_from_pixels",
    "attach_near_dup_png_payload",
    "dhash_images",
]

_GRID_W, _GRID_H = 9, 8  # 9×8 luma grid → 8×8 horizontal diffs = 64 bits


def dhash_from_pixels(arr: np.ndarray) -> int:
    """64-bit dHash of a decoded uint8 image ((h, w) grey or (h, w, 3)
    RGB), returned as a SIGNED 64-bit value (two's complement — what a
    Spark/DuckDB BIGINT column holds).

    Steps, all integer-exact: luma = (299R + 587G + 114B) // 1000 (identity
    for grey); downsample to a 9×8 grid by block means (pixel (x, y) maps
    to block (x·9//w, y·8//h); mean = sum // count); bit (by·8 + bx) is set
    when grid[by, bx] < grid[by, bx+1]."""
    a = arr.astype(np.int64)
    if a.ndim == 3:
        luma = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    else:
        luma = a
    h, w = luma.shape
    # cell map + per-cell counts depend only on (h, w): memoize them
    # (r12, guide §4.5 — the mgrid/bincount rebuild per call was most of
    # the hash's cost; the fixture has a handful of distinct shapes).
    cell, sums = _grid_cells(h, w)
    tot = np.bincount(cell, weights=luma.ravel(), minlength=_GRID_W * _GRID_H)
    grid = (tot.astype(np.int64) // sums).reshape(_GRID_H, _GRID_W)
    bits = grid[:, :-1] < grid[:, 1:]  # (8, 8) gradient signs
    # exact little-endian bit pack: byte j's bit k = bits[8j + k], so
    # int.from_bytes(..., "little") == Σ bits[i] << i — the loop's value
    v = int.from_bytes(
        np.packbits(bits.ravel(), bitorder="little").tobytes(), "little"
    )
    return v - (1 << 64) if v >= 1 << 63 else v


@lru_cache(maxsize=256)
def _grid_cells(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(cell ids raveled, per-cell pixel counts clamped >= 1) for one
    image shape — pure functions of (h, w), shared across calls."""
    y, x = np.mgrid[0:h, 0:w]
    cell = (y * _GRID_H // h * _GRID_W + x * _GRID_W // w).ravel()
    sums = np.maximum(
        np.bincount(cell, minlength=_GRID_W * _GRID_H), 1
    )
    # the cached arrays are shared across every call of this shape — an
    # in-place write anywhere downstream would corrupt all later hashes,
    # so hand them out read-only (ADVICE r12)
    cell.flags.writeable = False
    sums.flags.writeable = False
    return cell, sums


def _near_dup_fixture_pixels(doc_id: int) -> np.ndarray:
    """Fixture image with planted brightness-shift near-dups: docs share a
    base image per ``doc_id // 4``; variant ``doc_id % 4`` adds a uniform
    +16·variant to every channel. Base channels stay < 192 (mod 192), so
    +48 max never wraps — the shift is exactly uniform and the dHash is
    provably identical across a group. Even bases are RGB, odd greyscale."""
    base = doc_id // 4
    v = 16 * (doc_id % 4)
    # w ≥ 9 and h ≥ 8 keep every cell of the 9×8 dHash grid non-empty
    # (floor(x·9/w) is onto 0..8 only when w ≥ 9), so the relational
    # oracle's grid CTE is dense and needs no empty-cell backfill.
    w = 9 + (base * 5) % 8
    h = 8 + (base * 7) % 6
    y, x = np.mgrid[0:h, 0:w]
    # Base-dependent QUADRATIC coefficients: a purely additive base term
    # would be a brightness shift itself (dHash-invariant), collapsing
    # distinct bases onto one hash — the curvature must vary per base for
    # bases to separate (measured: 1250/1250 distinct hashes, min
    # cross-base hamming 5 at sf0.1).
    cx = base * base % 19 + 3
    cy = base % 13 + 2
    cxy = base * 3 % 11 + 1
    if base % 2 == 0:
        r = (7 * base + cx * x * x + cy * y * y + cxy * x * y) % 192 + v
        g = (11 * base + cy * x * x + cxy * y * y + cx * x * y) % 192 + v
        b = (13 * base + cxy * x * x + cx * y * y + cy * x * y + x) % 192 + v
        return np.stack([r, g, b], axis=2).astype(np.uint8)
    return (
        (9 * base + (cx + 1) * x * x + cy * y * y + cxy * x * y + 2 * x)
        % 192 + v
    ).astype(np.uint8)


def attach_near_dup_png_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """REAL PNG payloads carrying the planted near-dup structure."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_png(_near_dup_fixture_pixels(int(d)))
                        for d in pdf[id_col]
                    ],
                }
            )

    return spread_keys(df, id_col).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )


def dhash_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fused decode→dHash Arrow stage: PNG payload in, (id, dhash) out.
    The payload column never leaves the stage — 64 bits per image shuffle
    onward, not the pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "dhash": [
                        dhash_from_pixels(decode_png(bytes(p)))
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(run, schema=f"{id_col} bigint, dhash bigint")
