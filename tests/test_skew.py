"""Salting utilities are pure plan rewrites: row-identical to the unsalted
form on a deliberately skewed dataset (one key = 50% of rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_big_data_project_spark.operators.skew import (
    salted_join,
    two_stage_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, half on key 0 — the hot-key shape
    big = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_matches_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").select("row_id", "name")
    salted = salted_join(big, small, "k", n_salts=8, salt_source="row_id").select(
        "row_id", "name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_matches_plain(spark, skewed):
    big, small = skewed
    # left join with a small side missing some keys: unmatched big rows kept once
    part = small.filter(F.col("k") < 25)
    plain = big.join(part, "k", "left").select("row_id", "name")
    salted = salted_join(
        big, part, "k", n_salts=8, salt_source="row_id", how="left"
    ).select("row_id", "name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_outer_modes(spark, skewed):
    big, small = skewed
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(big, small, "k", how=how)


def test_ngram_stop_shingle_cut_identity_when_no_hot(spark):
    # No shingle crosses the doc-frequency threshold -> filtered output is
    # row-identical to the unfiltered one.
    from stock_market_big_data_project_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "one two three four five six"),
            (4, "one two three four five seven"),
            (5, "totally unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    plain = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.1)
    cut = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.1, max_doc_frac=0.9
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, cut.collect()))
    assert plain.count() > 0  # non-vacuous


def test_ngram_stop_shingle_cut_kills_hot_bucket(spark):
    # Every doc shares one hot phrase; otherwise all-unique. Unfiltered, the
    # hot shingle makes a quadratic candidate bucket (C(n,2) pairs at
    # threshold 0); with the cut the bucket disappears entirely.
    from stock_market_big_data_project_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    n_docs = 20
    docs = spark.createDataFrame(
        [
            (i, f"common hot phrase unique{i}a unique{i}b unique{i}c")
            for i in range(n_docs)
        ],
        "doc_id long, text string",
    )
    unfiltered = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.0)
    assert unfiltered.count() == n_docs * (n_docs - 1) // 2
    cut = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_doc_frac=0.5
    )
    assert cut.count() == 0


def test_two_stage_agg_matches_plain(spark, skewed):
    big, _ = skewed
    plain = (
        big.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("sum_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    salted = two_stage_agg(big, ["k"], ["v"], n_salts=8, salt_source="row_id").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
