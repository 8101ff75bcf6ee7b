"""Degenerate-input robustness: NULL text, empty strings, and empty
tables through the text/dedup/packing operator family. The fixtures
never produce these, but a real crawl does — the contract is "no crash,
sane values", not a particular result."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_big_data_project_spark.operators.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_banded,
    minhash_signatures,
)
from stock_market_big_data_project_spark.operators.packing import (
    pack_sequences_ffd,
)
from stock_market_big_data_project_spark.operators.text import (
    repetition_stats,
    tokens,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "only real doc here"),
        ],
        "doc_id long, text string",
    )


def test_tokens_on_null_and_blank(spark):
    got = {
        r.doc_id: r.n
        for r in _docs(spark)
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    # size(NULL array) is -1 (legacy) or NULL (ANSI) — never a crash;
    # blank strings tokenize to zero
    assert got[1] in (-1, 0, None) and got[2] == 0 and got[3] == 0
    assert got[4] == 4


def test_repetition_stats_skips_tokenless_docs(spark):
    got = {r.doc_id: r for r in repetition_stats(_docs(spark), "doc_id", "text").collect()}
    # tokenless docs contribute no gram rows → absent, not crashed
    assert set(got) == {4}
    assert got[4].n_tokens == 4


def test_minhash_chain_on_sparse_corpus(spark):
    # doc 4 has 4 tokens → 3-shingles exist; the rest contribute nothing
    sig = minhash_signatures(_docs(spark), "doc_id", "text", n=3, k=16)
    banded = minhash_banded(sig, "doc_id", bands=4, rows=4)
    pairs = lsh_candidate_pairs(sig, "doc_id", bands=4, rows=4).collect()
    assert pairs == []  # a single signed doc can't pair with itself
    assert banded.filter(F.col("doc_id") != 4).count() == 0


def test_exact_dedup_handles_null_text(spark):
    out = exact_dedup_groups(_docs(spark), "doc_id", "text").collect()
    # md5(NULL) is NULL → the NULL-text doc forms its own group; blank
    # and whitespace texts hash distinctly; nothing crashes
    groups = {r.text_md5: (r.kept_id, r.n_copies) for r in out}
    assert len(groups) == 4
    assert groups[None][0] == 1


def test_ffd_packing_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert pack_sequences_ffd(df, "doc_id", "n_tokens", capacity=64).count() == 0
