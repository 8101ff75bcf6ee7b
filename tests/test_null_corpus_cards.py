"""Data-card parity on a corpus WITH NULL text and NULL lang — the
round-6 advisor's latent findings: (a) the exact-dup count-over-window
must not treat the shared NULL-md5 partition as mutual duplicates
(the oracle's `text_md5 IN (...)` yields NULL->0), and (b) n_langs must
ignore NULL langs like count(DISTINCT lang) / countDistinct do. The
standard fixtures have no NULLs, so this builds a corpus that does and
runs card query + oracle side-by-side."""

from __future__ import annotations

import os

import duckdb
import pytest

from stock_market_big_data_project_spark.plans import (
    LOCAL_ORACLES,
    LOCAL_QUERIES,
    ORACLES,
    QUERIES,
    load_all_plans,
)

from .oracle_utils import compare

load_all_plans()

# Tier-agnostic lookups: the r7 rotation promoted both cards to the
# driver tier; this test is about NULL semantics, not tier.
ALL_QUERIES = {**QUERIES, **LOCAL_QUERIES}
ALL_ORACLES = {**ORACLES, **LOCAL_ORACLES}

ROWS = [
    # doc_id, text, lang, source, n_chars
    (1, "alpha beta gamma delta epsilon zeta", "en", "web", 35),
    (2, "alpha beta gamma delta epsilon zeta", "en", "web", 35),  # exact dup
    (3, None, None, "web", 0),       # NULL text + NULL lang
    (4, None, "fr", "web", 0),       # NULL text, real lang
    (5, "unique words only in this document here", None, "books", 39),
    (6, "another unique document with different words", "de", "books", 44),
    (7, None, None, "books", 0),     # second NULL-text doc in books
    (8, "the quick brown fox jumps over the lazy dog", "en", "books", 43),
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("null_corpus"))
    spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture(scope="module")
def null_con(null_sf_dir):
    con = duckdb.connect()
    path = os.path.join(null_sf_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["corpus_stats_card", "incremental_stats_card"]
)
def test_card_parity_with_nulls(name, spark, null_sf_dir, null_con):
    spark_df = ALL_QUERIES[name](spark, null_sf_dir)
    oracle_pdf = null_con.execute(ALL_ORACLES[name]).fetchdf()
    errs = compare(spark_df, oracle_pdf, name)
    assert not errs, "\n".join(errs)
