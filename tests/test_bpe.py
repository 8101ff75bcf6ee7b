"""Differential tests for the distributed BPE trainer
(operators/bpe.py) against a pure-Python reference implementation —
the same check pattern as the Granger/forecast numerics (SURVEY.md §5.1):
the operator is iterative and not SQL-expressible, so instead of a DuckDB
oracle the EXACT merge sequence and segmentation must equal a
straightforward single-process implementation of the algorithm
(Sennrich et al. 2016, greedy left-to-right application)."""

from __future__ import annotations

import collections

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stock_market_big_data_project_spark.operators.bpe import (
    apply_bpe,
    train_bpe,
)
from stock_market_big_data_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def _ref_train(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: (round, 'a b', 'ab', total) list, greedy merges."""
    vocab = {tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), total = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((rnd, f"{a} {b}", a + b, total))
        vocab = {
            _ref_merge_word(syms, a, b): n for syms, n in vocab.items()
        }
    return merges


def _ref_merge_word(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_segment(word: str, merges: list[tuple[str, str, str]]) -> list:
    syms = tuple(list(word) + ["</w>"])
    for _, pair, _m, _t in merges:
        a, b = pair.split(" ")
        syms = _ref_merge_word(syms, a, b)
    return list(syms)


@pytest.fixture(scope="module")
def corpus_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    wc: collections.Counter = collections.Counter()
    for row in docs.select("text").toLocalIterator():
        for w in row["text"].strip().split():
            if w:
                wc[w] += 1
    return wc


def test_merge_sequence_matches_reference(spark, corpus_counts):
    docs = load_table(spark, SF_DIR, "documents")
    got = [tuple(r) for r in train_bpe(docs, n_merges=8).collect()]
    want = _ref_train(dict(corpus_counts), 8)
    assert got == want


def test_overlapping_runs_merge_greedily(spark):
    # Engineered worst case for the merge application: back-to-back pair
    # occurrences share their boundary spaces — without zero-width
    # lookarounds a substring replace consumes the trailing space and
    # merges the wrong positions in odd runs. The trainer must match the
    # greedy reference exactly.
    rows = [(1, "aaaa aaaa bab abab"), (2, "aaaa bab bab abab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = collections.Counter()
    for _, t in rows:
        for w in t.split():
            wc[w] += 1
    got = [tuple(r) for r in train_bpe(df, n_merges=6).collect()]
    want = _ref_train(dict(wc), 6)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        # 2-letter alphabet maximizes overlapping runs ("aabab") and
        # pair-count ties — exactly the cases where greedy left-to-right
        # application and deterministic tie-breaks can drift.
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=15,
    )
)
def test_property_random_corpora_match_reference(spark, words):
    rows = [(i, " ".join(words[i : i + 3])) for i in range(0, len(words), 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = collections.Counter(w for _, t in rows for w in t.split() if w)
    got = [tuple(r) for r in train_bpe(df, n_merges=4).collect()]
    want = _ref_train(dict(wc), 4)
    assert got == want


def test_apply_bpe_matches_reference_segmentation(spark, corpus_counts):
    docs = load_table(spark, SF_DIR, "documents")
    merges_tbl = [tuple(r) for r in train_bpe(docs, n_merges=8).collect()]
    merges = [(p, m) for _, p, m, _ in merges_tbl]
    seg = (
        apply_bpe(docs.limit(20), merges)
        .select("word", "bpe_tokens")
        .collect()
    )
    assert len(seg) > 0
    for row in seg:
        assert row["bpe_tokens"] == _ref_segment(row["word"], merges_tbl)
