"""Spread a narrow key projection across the session's cores before a
compute-heavy Arrow generator/codec stage (optimization guide §2.6 idle
capacity, §4 Python boundary).

Why this exists: a mapInPandas stage inherits its input's partitioning.
The payload-attach stages in this engine expand a few-byte key row into a
real encoded media payload (PNG/JPEG/WAV/y4m/BMP bytes) and feed fused
decode/fingerprint stages — milliseconds of Python compute per row. When
the upstream is a single-file scan (the fixture parquet files are one
row group, so the scan is ONE task at any `maxPartitionBytes`), the whole
codec chain executes on one core while the other N-1 idle. Measured at
sf0.1/local[32]: `image_dhash_near_dup` 7.3 s single-task vs 0.9 s spread.

The fix is the forecaster's documented pattern (operators/stats.py): an
explicit round-robin repartition of the KEY PROJECTION — a few bytes per
row, never payload bytes — placed before the generator, sized to
``sc.defaultParallelism`` so it adapts to the session's core count
(SPARK_GRAFT_CPUS / cluster size) instead of a constant. At 100 TB the
same shape holds: what crosses the exchange is the key column, the heavy
bytes are born and consumed inside one narrow Arrow span per partition
(guide §2.3 "shuffle keys and metadata instead of payloads").

The keyless ``repartition(n)`` pays the sort-before-repartition pass
(SPARK-23207, guide §2.5) on the key projection only — trivially small —
and keeps retry determinism. Results are row-identical under any
partitioning (payloads are pure functions of the key), proven by the
oracle-parity suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_keys"]


def spread_keys(df: DataFrame, *cols: str) -> DataFrame:
    """Project ``cols`` and round-robin repartition to the default
    parallelism — the standard prologue for a per-row-expensive Arrow
    stage fed by a narrow scan."""
    sc = df.sparkSession.sparkContext
    return df.select(*cols).repartition(sc.defaultParallelism)
