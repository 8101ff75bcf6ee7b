"""The two-stage stratified top-K (plans/training.py::
stratified_source_sample) partitions stage 1 by (source,
spark_partition_id()) — an input-layout-dependent key. The OUTPUT must
not depend on it: the global top-K per stratum is a subset of the union
of per-partition top-Ks for ANY partition assignment, so stage 2's rank
is layout-free. This test pins that invariance by rerunning the query
over aggressively different input layouts."""

from __future__ import annotations

import pytest

from stock_market_big_data_project_spark.plans import registry

from .conftest import SF_DIR

registry.load_all_plans()


@pytest.mark.parametrize("n_parts", [1, 3, 17])
def test_output_invariant_to_input_partitioning(spark, n_parts):
    from pyspark.sql import functions as F

    from stock_market_big_data_project_spark.operators.text import md5_hash64
    from stock_market_big_data_project_spark.plans.training import (
        _STRAT_QUOTA,
    )
    from stock_market_big_data_project_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents").repartition(n_parts)
    hsh = md5_hash64(
        F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))
    )
    from pyspark.sql import Window

    hashed = d.select("source", "doc_id", hsh.alias("hsh"))
    w_local = Window.partitionBy("source", F.spark_partition_id()).orderBy(
        "hsh", "doc_id"
    )
    survivors = hashed.select(
        "source", "doc_id", "hsh", F.row_number().over(w_local).alias("lr")
    ).filter(F.col("lr") <= _STRAT_QUOTA)
    w = Window.partitionBy("source").orderBy("hsh", "doc_id")
    got = {
        (r.source, r.doc_id, r.rank)
        for r in survivors.select(
            "source", "doc_id", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= _STRAT_QUOTA)
        .collect()
    }
    # single-window reference (layout-free by construction)
    want = {
        (r.source, r.doc_id, r.rank)
        for r in hashed.select(
            "source", "doc_id", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= _STRAT_QUOTA)
        .collect()
    }
    assert got == want
