"""FROZEN machine-calibration probe set — DO NOT EDIT THE PLANS.

The per-round bench gate compares BENCH_r{N} totals across rounds, but
the totals are machine-bound: the judge measured the same byte-identical
plans running 1.5-2.0x slower after a mid-round-9 host reboot, and the
round-1 tree no longer runs on current fixtures, so the de-facto
25.337 s baseline cannot be re-measured (VERDICT r9).  This module pins
machine speed instead: three vendored copies of simple, stable plans
(snapshot of the live q1 / revenue / cube plans as of round 10) that
NEVER change, timed by bench.py before the headline set.

    calibration_factor = probe_total_now / PROBE_REFERENCE_TOTAL

A factor of 1.0 means "the machine runs the frozen plans at the same
speed as the round-10 reference machine"; >1.0 means slower hardware /
host state.  Cross-round comparisons and the 2x-of-baseline gate apply
to machine-normalized numbers: value / calibration_factor (BASELINE.md
documents the rule).  The probes are deliberately engine-simple (scan,
hash agg, shuffle+broadcast join, cube) so the factor tracks the host,
not any operator the round might be optimizing.

The plans are intentionally self-contained — plain parquet reads, no
imports from plans/ or sources/ — so drift in shared helpers can never
leak into the probe.  They are correctness-checked against the live
queries' oracles only indirectly (same math); their job is timing, and
their output is never compared to anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference measurement for the frozen probes: best-of-3 per probe from
# the first official IN-BENCH run (bench.py's own flow: warmup, noop
# sink, consecutive repeats, GC between runs) at sf0.1 on local[32],
# recorded 2026-08-16 on the post-reboot round-10 machine class.  An
# earlier ad-hoc pin (4.844 s total) was superseded by this in-bench
# measurement before the first recorded BENCH carried the factor — the
# pin and every future measurement must share the bench methodology.
# Pinned forever from here; re-pinning would break cross-round
# comparability.
PROBE_REFERENCE = {
    "cal_scan_agg": 1.550,
    "cal_join_chain": 1.411,
    "cal_cube": 1.162,
}
PROBE_REFERENCE_TOTAL = round(sum(PROBE_REFERENCE.values()), 3)

_DEC = "decimal(38,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # plain parquet read on purpose (no shared load_table): none of the
    # probe tables carry nanosecond timestamps, and the probe must not
    # inherit future changes to the shared reader
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cal_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen copy of q1_pricing_summary (r10 snapshot): scan -> pushed
    filter -> map-side-combined hash aggregate, one codegen span."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def s(c, a):
        return F.sum(c.cast(_DEC)).cast("double").alias(a)

    def avg(c, a):
        return F.try_divide(
            F.sum(c.cast(_DEC)).cast("double"), F.count(c)
        ).alias(a)

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        s(F.col("l_quantity"), "sum_qty"),
        s(F.col("l_extendedprice"), "sum_base_price"),
        s(disc_price, "sum_disc_price"),
        s(disc_price * (1 + F.col("l_tax")), "sum_charge"),
        avg(F.col("l_quantity"), "avg_qty"),
        avg(F.col("l_extendedprice"), "avg_price"),
        avg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def cal_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen copy of revenue_by_region (r10 snapshot): pre-aggregated
    fact -> shuffle join -> broadcast dimension chain -> final agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    li_per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev.cast(_DEC)).alias("_order_rev")
    )
    joined = (
        li_per_order.join(orders, li_per_order.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.sum("_order_rev").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def cal_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen copy of cube_pricing_totals (r10 snapshot): partial agg on
    the full key, then CUBE over the handful of partial rows."""
    li = _t(spark, sf_dir, "lineitem")
    partial = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("_q"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("_p"),
    )
    return partial.cube("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n_items"),
        F.sum("_q").cast("double").alias("sum_qty"),
        F.sum("_p").cast("double").alias("sum_price"),
    )


PROBES = {
    "cal_scan_agg": cal_scan_agg,
    "cal_join_chain": cal_join_chain,
    "cal_cube": cal_cube,
}
