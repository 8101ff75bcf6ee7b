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
