"""Shard packing by cumulative token budget — the "write side" of a
training-data pipeline: documents stream into fixed-token-budget shards in
a deterministic order, so a trainer can address shard k without scanning
the corpus.

The interesting part is the prefix sum. The naive form — one global
`Window.orderBy(id)` cumsum — moves EVERY row into a single partition
(Spark's no-partition window), which is exactly the kind of plan that
works at sf0.1 and dies at 100 TB. This module does the classic
distributed two-pass prefix sum instead:

1. range-partition by the order key (so partition p holds a contiguous
   key range, and partition order == key order);
2. per-partition interior cumsum — an ordinary partitioned window, fully
   parallel;
3. per-partition totals (one tiny row per partition) get their own
   cumulative offsets via a single window over ≤ thousands of rows, and
   broadcast-join back.

Total cost: one range shuffle + one map-side agg + one broadcast — no
row ever leaves its range partition for the sum itself. The range
partitioner samples, so PARTITION BOUNDARIES are nondeterministic — but
offset + interior sum telescopes to the true prefix sum under any
boundary placement, so the OUTPUT is bit-deterministic (asserted against
the single-window oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive prefix sum of `val_col` in `order_col` order, distributed
    via the two-pass scheme above. `order_col` values must be unique (they
    define the total order)."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n_parts, F.col(order_col)).withColumn(
        "_part", F.spark_partition_id()
    )
    interior = parted.withColumn(
        "_cum_in",
        F.sum(val_col).over(
            Window.partitionBy("_part")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # one row per partition; the window below runs over ≤ a few thousand
    # rows no matter the corpus size
    offsets = (
        parted.groupBy("_part")
        .agg(F.sum(val_col).alias("_part_sum"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_part_sum").over(
                    Window.orderBy("_part").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_part", "_offset")
    )
    return (
        interior.join(F.broadcast(offsets), "_part")
        .withColumn(out_col, (F.col("_offset") + F.col("_cum_in")).cast("bigint"))
        .drop("_part", "_cum_in", "_offset")
    )


def pack_token_shards(
    df: DataFrame,
    id_col: str,
    count_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document to a shard by cumulative token count in
    `id_col` order: shard k holds the docs whose cumulative-start offset
    falls in [k·budget, (k+1)·budget). A document never splits; a shard
    can exceed the budget by at most one document's tokens — the standard
    greedy packing a sequential writer would produce, reproduced
    deterministically and in parallel."""
    cum = prefix_sum(df, id_col, count_col, out_col="cum_tokens")
    return cum.withColumn(
        "shard_id",
        F.floor((F.col("cum_tokens") - F.col(count_col)) / F.lit(budget)).cast(
            "int"
        ),
    )
