"""SparkSession factory.

One place to pin every scale-relevant knob so tests, the driver harness and
``bench.py`` all run the same configuration.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast selection replace hand-tuned partition counts.
- Arrow on: every pandas-UDF exchange (the statistical operators) moves
  columnar batches, not pickled rows.
- UTC session timezone: matches the reference's utcnow() event time and the
  DuckDB oracle's naive-UTC timestamps.
- shuffle.partitions defaults to the local core count; on a real cluster this
  is overridden (or simply left to AQE's coalescing) via SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "stock_market_big_data_project_spark") -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Not larger: an oversized heap never GCs, so Spark's ContextCleaner
        # (GC-triggered) never reclaims finished shuffles/broadcasts and
        # every subsequent query in the session degrades. 16g fits sf0.1
        # working sets many times over while keeping the cleaner live.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        # parquet scans: vectorized reader + pushdown are on by default; pin
        # split size so sf0.1 single files still parallelize across cores.
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # Whole-stage-codegen class cache (static conf, default 100 entries):
        # an 89-query engine cycles several hundred codegen spans, so the
        # default evicts constantly and queries pay a fresh ~0.5-1.5 s janino
        # compile on every revisit (measured on correlation_matrix, SCALE.md
        # r3/r4). Size the cache to the query mix — same knob a long-lived
        # cluster session would pin.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
