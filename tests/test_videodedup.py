"""Tests for video near-dup detection via keyframe dHash
(operators/videodedup.py). The end-to-end query (`video_keyframe_near_dup`)
is hash-checked by test_oracle_parity; these pin the planted-structure
guarantees and the full Spark pipeline's recall/exactness."""

from __future__ import annotations

import itertools

import numpy as np

from stock_market_big_data_project_spark.operators.imagehash import (
    dhash_from_pixels,
)
from stock_market_big_data_project_spark.operators.videodedup import (
    _video_near_dup_frames,
    attach_near_dup_y4m_payload,
    video_keyframe_hashes,
    video_near_dup_pairs,
)
from stock_market_big_data_project_spark.operators.y4m import (
    decode_y4m,
    encode_y4m,
)


def _kf_hashes(doc_id: int) -> list[int]:
    fr = _video_near_dup_frames(doc_id)
    return [
        dhash_from_pixels(fr[f, 0]) for f in range(0, fr.shape[0], 3)
    ]


def test_variants_share_keyframe_hashes_but_not_bytes():
    """Same-base variants: identical luma dHashes (uniform wrap-free
    shift), different payload bytes (chroma rewritten) — the class of
    near-dup byte-level dedup cannot see."""
    for base in range(12):
        group = [_kf_hashes(base * 4 + k) for k in range(4)]
        assert all(g == group[0] for g in group), f"base {base}"
    p0 = encode_y4m(_video_near_dup_frames(0))
    p1 = encode_y4m(_video_near_dup_frames(1))
    assert p0 != p1


def test_cross_base_clips_mostly_separate():
    """Unrelated clips occasionally share a near keyframe (the fixture's
    quadratic luma space is finite — measured 0.08% of base pairs at
    sf0.1), which the operator reports honestly and the oracle replays;
    what matters is that the planted near-dups don't drown: the
    cross-base near rate stays well under 1%."""
    hs = [_kf_hashes(b * 4) for b in range(60)]
    near = 0
    pairs = 0
    for i, j in itertools.combinations(range(60), 2):
        m = min(
            bin((a ^ b) & ((1 << 64) - 1)).count("1")
            for a in hs[i]
            for b in hs[j]
        )
        near += m <= 3
        pairs += 1
    assert near / pairs < 0.01, f"{near}/{pairs} cross-base near pairs"


def test_fixture_payloads_are_real_y4m():
    for d in (0, 1, 4, 5):
        fr = _video_near_dup_frames(d)
        back, _ = decode_y4m(encode_y4m(fr))
        assert np.array_equal(back, fr)


def test_planted_recall_on_spark(spark):
    """End-to-end: every planted same-base clip pair is reported with
    n_frame_matches ≥ its keyframe count (hamming-0 frame matches), and
    every reported match count / min distance recomputes exactly in
    numpy."""
    ids = spark.range(0, 48).withColumnRenamed("id", "doc_id")
    hashes = video_keyframe_hashes(attach_near_dup_y4m_payload(ids))
    got = {
        (r.id_a, r.id_b): (r.n_frame_matches, r.min_hamming)
        for r in video_near_dup_pairs(hashes).collect()
    }
    hs = {d: _kf_hashes(d) for d in range(48)}
    planted = {
        (base * 4 + i, base * 4 + j)
        for base in range(12)
        for i, j in itertools.combinations(range(4), 2)
    }
    for a, b in planted:
        assert (a, b) in got, f"planted clip pair ({a}, {b}) missed"
        n, mh = got[(a, b)]
        assert mh == 0 and n >= len(hs[a])
    # exactness of every reported pair vs brute-force numpy
    for (a, b), (n, mh) in got.items():
        dists = [
            bin((x ^ y) & ((1 << 64) - 1)).count("1")
            for x in hs[a]
            for y in hs[b]
        ]
        matches = [d for d in dists if d <= 3]
        assert n == len(matches) and mh == min(matches)
