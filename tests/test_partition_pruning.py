"""Partitioned-storage pruning: the at-rest layout SURVEY §4 prescribes
(date-partitioned tables) must turn time predicates into physical
partition pruning, not just row filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_big_data_project_spark.sources.tables import (
    load_table,
    write_parquet,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_by_day"))
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    write_parquet(ev, d, partition_by=("day",))
    return d


def test_day_filter_prunes_partitions(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("day") == "2024-01-02"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the predicate must land in PartitionFilters (physical file pruning),
    # not PushedFilters/post-scan Filter
    assert "PartitionFilters: [isnotnull(day" in plan, plan
    n_total = spark.read.parquet(partitioned_events).select("day").distinct().count()
    assert n_total > 1  # pruning is meaningful: many day partitions exist
    assert df.count() > 0


def test_pruned_scan_matches_partition_dir(spark, partitioned_events):
    one_day = spark.read.parquet(partitioned_events).filter(
        F.col("day") == "2024-01-02"
    )
    # the physical layout really isolates the day: reading ONLY that
    # partition directory yields the identical row set
    direct = spark.read.parquet(f"{partitioned_events}/day=2024-01-02")
    assert one_day.count() == direct.count() > 0


def test_ivf_cell_partitioned_probe_prunes(spark, tmp_path):
    """The IVF at-rest story end to end: write embeddings partitioned by
    their coarse-quantizer cell, probe a 2-cell read, and prove the
    unprobed ~6/8 of the corpus is pruned at the FILE level (PartitionFilters),
    with the probed rows identical to the in-memory cell assignment."""
    from stock_market_big_data_project_spark.operators.similarity import ivf_cells
    from stock_market_big_data_project_spark.sources.tables import load_table
    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cells = ivf_cells(emb).select("vec_id", "cell")
    at_rest = emb.join(cells, "vec_id")
    path = str(tmp_path / "emb_by_cell")
    at_rest.write.mode("overwrite").partitionBy("cell").parquet(path)

    probed = spark.read.parquet(path).filter(F.col("cell").isin(0, 3))
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [cell" in plan or "PartitionFilters: [isnotnull(cell" in plan, plan
    expected = {r.vec_id for r in cells.filter(F.col("cell").isin(0, 3)).collect()}
    got = {r.vec_id for r in probed.select("vec_id").collect()}
    assert got == expected
    assert 0 < len(got) < emb.count()  # pruning is non-vacuous
