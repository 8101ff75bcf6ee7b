"""Correlated-subquery and disjunctive-predicate query shapes on the
TPC-H-ish tables — the relational-completeness pack.

The reference's pandas scripts never need EXISTS / NOT EXISTS / scalar
subqueries (eager row loops express them implicitly); a *query engine*
replacing them must, so this module registers the classic decorrelation
shapes as first-class audited plans:

- correlated EXISTS with a non-equi residual  -> left-semi join
- correlated NOT EXISTS with a residual       -> left-anti join
- IN (GROUP BY ... HAVING) subquery           -> aggregate + equi join
- correlated scalar MIN subquery              -> group-min + join-back
- scalar aggregate subquery in WHERE          -> 1-row broadcast cross
- role-playing dimension (nation joined twice under two aliases)
- disjunctive multi-clause predicate across a join (OR-of-ANDs)

Every query carries a full DuckDB hash oracle: the oracle states the
subquery form, the Spark side states the decorrelated join form, and the
bitwise compare proves the rewrite.  At 100 TB each shape stays a single
keyed shuffle (semi/anti joins move only the probe side; the scalar
subqueries broadcast exactly one row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import (
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
)
from ..sources.tables import load_table
from .registry import register_local


# --------------------------------------------------------------------------
# Correlated EXISTS with a non-equi residual predicate (TPC-H Q4 shape:
# "orders where at least one lineitem shipped more than 60 days after the
# order date").  Decorrelates to a LEFT SEMI join on the order key with the
# date comparison as a residual — the probe side never duplicates rows, so
# the count is over orders, not order x lineitem.
# --------------------------------------------------------------------------
@register_local(
    "correlated_exists_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def correlated_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS -> left_semi with the correlated residual inside the join
    condition.  The order-date window is applied BEFORE the join so it
    pushes to the orders scan (PushedFilters), and only the filtered slice
    shuffles.  At 100 TB: one equi-keyed shuffle; lineitem contributes keys
    only (no payload columns cross the exchange beyond the residual's)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Correlated NOT EXISTS (the anti twin): orders where EVERY lineitem
# shipped within 90 days of the order date.
# --------------------------------------------------------------------------
@register_local(
    "not_exists_prompt_orders",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_prompt_orders,
           {oracle_exact_sum('o_totalprice')} AS sum_totalprice
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderstatus
    """,
)
def not_exists_prompt_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left_anti with the same residual-in-condition
    decorrelation.  Anti joins are null-safe here because the correlation
    key (o_orderkey) is a non-null primary key on both sides — the NOT IN
    null trap does not arise, and the plan is the identical single keyed
    shuffle as the semi twin."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_anti")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_prompt_orders"),
            exact_sum("o_totalprice", "sum_totalprice"),
        )
    )


# --------------------------------------------------------------------------
# IN (SELECT ... GROUP BY ... HAVING) subquery (TPC-H Q18 shape: large-
# volume orders).  Decorrelates to aggregate-then-join; the HAVING filter
# runs map-side-combined before any join, so only qualifying order keys
# (~1% of orders at the 270 threshold) reach the join.
# --------------------------------------------------------------------------
@register_local(
    "large_volume_orders",
    oracle=f"""
    WITH vol AS (
      SELECT l_orderkey,
             {oracle_exact_sum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, v.sum_qty
    FROM orders o
    JOIN vol v ON v.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE v.sum_qty > 270.0
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-first decorrelation: the per-order quantity rollup (decimal
    partial sums, exact under re-aggregation) and its HAVING cut happen
    BEFORE the orders/customer joins, so the join input is the ~1%
    qualifying slice, not the fact table.  customer stays unhinted (size is
    proportional to SF); AQE broadcasts it at test SFs."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    vol = (
        li.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 270.0)
    )
    return (
        orders.join(vol, orders.o_orderkey == vol.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


# --------------------------------------------------------------------------
# Disjunctive multi-clause predicate across a join (TPC-H Q19 shape:
# OR-of-ANDs mixing fact and dimension columns).
# --------------------------------------------------------------------------
@register_local(
    "disjunctive_part_revenue",
    oracle=f"""
    SELECT p.p_brand,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 25)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 5 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 10 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    GROUP BY p.p_brand
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across a join: Catalyst factors the single-table implied
    conjuncts out of the disjunction and pushes them to each scan —
    p_brand IN (...) onto part, l_quantity BETWEEN 1 AND 50 onto lineitem —
    so both sides prune before the join, and the exact disjunction runs as
    a post-join residual.  part is SF-proportional, left unhinted."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disj = (
        ((br == "Brand#13") & sz.between(1, 15) & q.between(1, 25))
        | ((br == "Brand#22") & sz.between(5, 30) & q.between(10, 35))
        | ((br == "Brand#25") & sz.between(10, 50) & q.between(20, 50))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.filter(disj)
        .groupBy("p_brand")
        .agg(
            exact_sum(rev, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Correlated scalar MIN subquery (TPC-H Q2 shape: the cheapest supplier per
# part).  Decorrelates to group-min + join-back-on-equality; the double
# unit price is computed by the identical IEEE expression on both engines,
# so the equality join is bit-deterministic.
# --------------------------------------------------------------------------
@register_local(
    "min_cost_supplier_per_part",
    oracle="""
    WITH px AS (
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem
    ), m AS (
      SELECT l_partkey, min(unit_price) AS min_unit_price
      FROM px GROUP BY l_partkey
    ), best AS (
      SELECT px.l_partkey, min(px.l_suppkey) AS best_suppkey
      FROM px JOIN m ON px.l_partkey = m.l_partkey
                    AND px.unit_price = m.min_unit_price
      GROUP BY px.l_partkey
    )
    SELECT p.p_partkey, p.p_name, m.min_unit_price, b.best_suppkey,
           s.s_name AS best_supplier
    FROM part p
    JOIN m ON m.l_partkey = p.p_partkey
    JOIN best b ON b.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = b.best_suppkey
    WHERE p.p_type = 'ECONOMY' AND p.p_size <= 10
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery decorrelation: min-per-part, join back on value
    equality, min-suppkey tie-break (a deterministic total order — ties on
    the double min are real when two suppliers quote the same price).  The
    part filter prunes first; supplier grows linearly with SF in this
    fixture (10k rows per unit SF — billions at a 100 TB SF), so it stays
    UNHINTED and AQE size-gates the build side: BroadcastHashJoin at test
    SFs, shuffle join past the threshold."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 10)
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    m = li.groupBy("l_partkey").agg(
        F.min("unit_price").alias("min_unit_price")
    )
    best = (
        li.join(
            m.withColumnRenamed("l_partkey", "_mk"),
            (F.col("l_partkey") == F.col("_mk"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .groupBy("l_partkey")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        part.join(m, m.l_partkey == part.p_partkey)
        .join(best.withColumnRenamed("l_partkey", "_bk"), F.col("_bk") == part.p_partkey)
        .join(supplier, F.col("s_suppkey") == F.col("best_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "min_unit_price",
            "best_suppkey",
            F.col("s_name").alias("best_supplier"),
        )
    )


# --------------------------------------------------------------------------
# Role-playing dimension: nation joined twice under two aliases (TPC-H Q7
# shape — cross-nation trade volume between customer and supplier nations).
# --------------------------------------------------------------------------
@register_local(
    "nation_pair_trade_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS volume,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
      AND sn.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
      AND cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
    """,
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation participates twice under different join roles — the aliased
    scans are independent broadcasts (25 rows each at ANY scale factor), so
    the role-playing costs zero extra shuffles.  Both nation filters apply
    inside their broadcast build sides; the <> residual runs post-join.
    supplier and customer are both SF-proportional in this fixture and
    stay unhinted — AQE broadcasts them at test SFs and falls back to
    shuffle joins past its size threshold.  Only the aliased nation scans
    (scale-constant) carry explicit hints."""
    nations = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cn = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(nations))
        .select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sn = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(nations))
        .select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cn), customer.c_nationkey == F.col("cn_key"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return j.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(
        exact_sum(rev, "volume"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# Scalar aggregate subquery in WHERE + correlated NOT EXISTS (TPC-H Q22
# shape, adapted: every fixture customer has SOME order, so the anti side
# is "no order since 2000-01-01" — dormant high-balance customers).
# --------------------------------------------------------------------------
@register_local(
    "dormant_high_balance_customers",
    oracle=f"""
    SELECT c.c_nationkey,
           count(*) AS n_dormant,
           {oracle_exact_sum('c.c_acctbal')} AS total_balance
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {oracle_exact_avg('c_acctbal')}
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def dormant_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two decorrelations in one plan: the scalar AVG subquery becomes a
    1-row broadcast cross join (O(n), on the tiny-cross allowlist), and the
    correlated NOT EXISTS becomes a left_anti against orders PRE-FILTERED
    on the date (the predicate pushes to the orders scan, so the anti
    build side holds only recent order keys — at 100 TB that is the
    partition-pruned tail, not the full history)."""
    customer = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    cutoff = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(exact_avg("c_acctbal", "_avg_bal"))
    )
    return (
        customer.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_dormant"),
            exact_sum("c_acctbal", "total_balance"),
        )
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping() indicators — the explicit multi-grain
# aggregate (cube/rollup are its special cases; the engine already carries
# both, this pins the general form).  One ANSI text, two engines: the
# oracle string IS the spark.sql() input (the sql_interface_revenue
# pattern), so the grain-indicator semantics (grouping() = 1 on the
# aggregated-away axis, NULL group keys disambiguated) hash-certify
# directly.
# --------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register_local("grouping_sets_pricing", oracle=_GROUPING_SETS_SQL)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three grains in ONE scan: Spark expands grouping sets into a single
    Expand + hash aggregate (each input row fans out once per set), so the
    fact table is read once however many grains are requested — the same
    plan shape cube_pricing_totals uses, here with an explicit set list
    and grouping() indicators."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


# --------------------------------------------------------------------------
# Correlated scalar AVG subquery with a multiplier (TPC-H Q17 shape:
# "small-quantity orders" — lineitems whose quantity is below 20% of
# their part's average quantity).
# --------------------------------------------------------------------------
@register_local(
    "below_avg_quantity_revenue",
    oracle=f"""
    SELECT l.l_returnflag,
           {oracle_exact_sum('l.l_extendedprice')} AS sum_price,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.2 * ({oracle_exact_avg('l2.l_quantity')})
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    GROUP BY l.l_returnflag
    """,
)
def below_avg_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG decorrelation: the per-part average is ONE
    map-side-combined aggregate over lineitem (decimal-exact, so the
    0.2× threshold is the identical double on both engines), joined back
    on the part key.  The `p_type='SMALL'` part keys are semi-joined into
    the aggregate's BUILD side first — only surviving parts can reach the
    output, and the semi join keeps every lineitem row of those parts, so
    their averages are unchanged while the full-lineitem aggregate (the
    query's dominant cost at 100×) disappears.  Both lineitem passes
    shuffle on the same key; AQE broadcasts the filtered part side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    li_small = li.join(
        part, li.l_partkey == part.p_partkey, "left_semi"
    )
    avg_q = li_small.groupBy(F.col("l_partkey").alias("_pk")).agg(
        exact_avg("l_quantity", "_avg_qty")
    )
    return (
        li_small.join(avg_q, li_small.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .groupBy("l_returnflag")
        .agg(
            exact_sum("l_extendedprice", "sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# HAVING-equals-scalar-max (TPC-H Q15 shape: the top supplier(s) by
# revenue, ties preserved — an aggregate compared against the max over
# the same aggregate).
# --------------------------------------------------------------------------
@register_local(
    "top_supplier_by_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {oracle_exact_sum('l_extendedprice * (1 - l_discount)')} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-vs-scalar-max-of-itself: the revenue rollup is computed
    ONCE, the max is a 1-row reduction of that rollup (broadcast cross —
    suppliers-sized input, so the 'scan twice' of the naive form never
    touches the fact table twice), and ties survive (every supplier at
    the max, exactly the Q15 contract).  The date window pushes to the
    lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "total_rev",
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


# --------------------------------------------------------------------------
# Multi-correlated EXISTS + NOT EXISTS self-joins (TPC-H Q21 shape,
# adapted to the fixture's columns: "late" = shipped >60 days after the
# order date, since the fixtures carry no commit/receipt dates): suppliers
# who were the ONLY late shipper on a finished multi-supplier order — the
# hardest classic decorrelation (two correlated subqueries against the
# SAME fact table, one kept, one negated).
# --------------------------------------------------------------------------
@register_local(
    "sole_late_shipper_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def sole_late_shipper_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 decorrelation: the late-lineitem slice is computed ONCE (orders
    filtered to 'F' joined to lineitem with the 60-day residual), then the
    EXISTS becomes a left-semi against lineitem keys on (same order,
    different supplier) and the NOT EXISTS a left-anti against the SAME
    late slice on the same condition — both single keyed shuffles on the
    order key, with the supplier-inequality as a residual.  lineitem is
    scanned twice but only (orderkey, suppkey) columns cross the
    exchanges; supplier (SF-proportional, unhinted) joins onto the
    surviving rows — AQE broadcasts it at test SFs."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_k2"), F.col("l_suppkey").alias("_s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("_k3"), F.col("l_suppkey").alias("_s3")
    )
    sole = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("_k2"))
            & (F.col("l_suppkey") != F.col("_s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("_k3"))
            & (F.col("l_suppkey") != F.col("_s3")),
            "left_anti",
        )
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        sole.join(supplier, sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# Nested IN with a correlated scalar aggregate in HAVING (TPC-H Q20 shape,
# adapted: no partsupp table in the fixtures, so "availability" becomes
# shipped-quantity share): suppliers who shipped more than 30% of some
# large part's total shipped quantity.
# --------------------------------------------------------------------------
@register_local(
    "dominant_part_suppliers",
    oracle=f"""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING {oracle_exact_sum('l.l_quantity')} >
             0.3 * (SELECT {oracle_exact_sum('l2.l_quantity')}
                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    )
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 decorrelation: the part filter semi-joins into BOTH aggregates'
    build sides (the Q17 prune — the correlated denominator only matters
    for surviving partkeys, and partkey equality makes the restricted
    total identical), the per-(supplier, part) sums and per-part totals
    are two map-side-combined aggregates over the SAME pruned slice, the
    HAVING becomes a join-back on the part key, and the outer IN a
    left-semi into supplier.  Decimal-exact sums make the 0.3× threshold
    the identical double on both engines."""
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 40)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    li_f = li.join(part_keys, li.l_partkey == part_keys.p_partkey, "left_semi")
    per_sp = li_f.groupBy("l_suppkey", "l_partkey").agg(
        exact_sum("l_quantity", "_sp_qty")
    )
    per_part = li_f.groupBy(F.col("l_partkey").alias("_pk")).agg(
        exact_sum("l_quantity", "_p_qty")
    )
    winners = (
        per_sp.join(per_part, per_sp.l_partkey == F.col("_pk"))
        .filter(F.col("_sp_qty") > 0.3 * F.col("_p_qty"))
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.join(
        winners, supplier.s_suppkey == winners.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# Group aggregate HAVING vs a global-scalar fraction (TPC-H Q11 shape):
# parts whose revenue exceeds 0.1% of total revenue.
# --------------------------------------------------------------------------
@register_local(
    "high_share_parts",
    oracle=f"""
    SELECT l_partkey,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount)')} AS part_rev
    FROM lineitem
    GROUP BY l_partkey
    HAVING {oracle_exact_sum('l_extendedprice * (1 - l_discount)')} >
           0.001 * (SELECT {oracle_exact_sum('l2.l_extendedprice * (1 - l2.l_discount)')}
                    FROM lineitem l2)
    """,
)
def high_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 decorrelation: the global total is NOT a second lineitem scan —
    decimal partial sums reassociate losslessly, so the 1-row total is an
    exact re-aggregation of the per-part decimal partials, broadcast-
    crossed onto the group rows (the Q22 scalar pattern).  One shuffle on
    the group key; the threshold 0.001×total is the identical double on
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev.cast("decimal(38,6)")).alias("_rev_dec")
    )
    tot = per_part.agg(
        F.sum("_rev_dec").cast("double").alias("_total_rev")
    )
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.col("_rev_dec").cast("double") > 0.001 * F.col("_total_rev")
        )
        .select(
            "l_partkey",
            F.col("_rev_dec").cast("double").alias("part_rev"),
        )
    )


# --------------------------------------------------------------------------
# r11 additions — the remaining classic TPC-H aggregate shapes the pack
# lacked, adapted to the fixture star schema (no partsupp table):
# conditional-aggregate ratio (Q14), market-share ratio over a six-join
# chain (Q8), left join with a filtered JOIN predicate + two-level
# aggregate (Q13), ordered top-k over grouped revenue (Q10), and
# CASE-bucketed counts under a non-equi date residual (Q12).
# --------------------------------------------------------------------------
_DEC38 = "decimal(38,6)"


@register_local(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
           100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(38,6))
                       ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')}
             AS promo_share,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue as a percentage of total revenue per ship
    year — a conditional decimal aggregate and an unconditional one in
    the SAME grouped pass (one scan, one shuffle), then one double
    division (identical IEEE op from hash-equal inputs).  The part side
    carries only (p_partkey, p_type) after column pruning, but part is
    SF-proportional (200k rows per unit SF) so it stays unhinted: AQE
    broadcasts it at test SFs, shuffles past the size threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec0 = F.lit(0).cast(_DEC38)
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev.cast(_DEC38))
                .otherwise(dec0)
            ).cast("double").alias("_promo"),
            exact_sum(rev, "_all"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return agg.select(
        "ship_year",
        (100.0 * F.col("_promo") / F.col("_all")).alias("promo_share"),
        "n_items",
    )


@register_local(
    "national_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                    THEN CAST(vol AS DECIMAL(38,6))
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / {oracle_exact_sum('vol')} AS mkt_share,
           count(*) AS n_items
    FROM rev GROUP BY 1
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (role-playing nation dimension under BOTH the customer
    and the supplier leg): NATION_7 suppliers' share of revenue sold to
    ASIA customers, per order year.  Six-table join chain: the
    scale-constant dimensions (nation twice under different aliases,
    region folded into the customer-nation build side) carry explicit
    broadcast hints; the SF-proportional sides (the filtered ASIA
    customer-key list, supplier) stay unhinted so AQE size-gates them —
    broadcast at test SFs, shuffle at cluster scale.  The fact flows
    through exactly one grouped exchange; the share is a conditional /
    unconditional decimal-sum pair divided once in double."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n1 = nation.alias("n1")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    asia_cust = (
        cust.join(
            F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey")
        )
        .join(
            F.broadcast(region),
            (F.col("n1.n_regionkey") == region.r_regionkey)
            & (region.r_name == "ASIA"),
        )
        .select("c_custkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec0 = F.lit(0).cast(_DEC38)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == asia_cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(n2), supp.s_nationkey == n2.n2_nationkey
        )
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_7", rev.cast(_DEC38))
            .otherwise(dec0)
        ).cast("double").alias("_nat"),
        exact_sum(rev, "_all"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg.select(
        "o_year",
        (F.col("_nat") / F.col("_all")).alias("mkt_share"),
        "n_items",
    )


@register_local(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1
    ) GROUP BY 1
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: the filtered-JOIN-predicate left join (the filter
    belongs in the ON clause — pushing it to a WHERE would silently drop
    zero-order customers from the distribution) followed by a two-level
    aggregate.  count(o_orderkey) counts only matched rows, so customers
    whose every order is '4-NOT SPECIFIED' land in the c_count=0 bucket
    exactly like order-less customers — the semantics the ON-vs-WHERE
    distinction exists for."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register_local(
    "returned_items_top_customers",
    oracle=f"""
    SELECT c_custkey, c_name, revenue, n_items FROM (
      SELECT c.c_custkey, any_value(c.c_name) AS c_name,
             {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')}
               AS revenue,
             count(*) AS n_items
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      GROUP BY c.c_custkey
    ) QUALIFY row_number() OVER (ORDER BY revenue DESC, c_custkey) <= 20
    """,
)
def returned_items_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer, top 20.
    The grouped revenue is decimal-exact (hash-equal doubles on both
    engines), so the ORDER BY revenue ranking is deterministic given the
    c_custkey tie-break; Spark plans the top-k as a single
    TakeOrderedAndProject-style window over the grouped rows, never a
    global sort of the fact table."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    grouped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_name").alias("c_name"),
            exact_sum(rev, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return (
        grouped.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .drop("_rn")
    )


@register_local(
    "late_shipment_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
    GROUP BY 1
    """,
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: CASE-bucketed priority counts over lineitems that
    shipped more than 45 days after their order date — the non-equi date
    residual rides the equi join on the order key (one keyed shuffle),
    and both CASE branches aggregate in the same grouped pass.  Counts
    are integer-exact; the oracle casts DuckDB's HUGEINT sums back to
    BIGINT for schema parity."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register_local(
    "part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
           count(*) AS n_lines
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — the pack's remaining decorrelation: NOT IN
    (uncorrelated subquery) → LEFT ANTI join (exact because s_suppkey is
    non-null by construction; with a nullable subquery column NOT IN's
    three-valued semantics would need the extra null-check branch), plus
    a grouped COUNT(DISTINCT) — supplier variety per (brand, type, size)
    excluding negative-balance suppliers. The anti join's build side is
    the excluded-supplier list — a filtered slice of an SF-proportional
    table, so it stays unhinted (AQE broadcasts it at test SFs); the
    distinct-count
    aggregates in one exchange on the composite group key. The oracle
    states the NOT IN form; the hash match proves the rewrite."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    ).filter(F.col("p_brand") != "Brand#5")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register_local(
    "nation_year_profit",
    oracle=f"""
    SELECT n.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - p.p_retailprice * l.l_quantity * 0.1
                         AS DECIMAL(38,6))) AS DOUBLE) AS profit,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gi%'
    GROUP BY 1, 2
    """,
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (the last classic TPC-H aggregate the pack lacked —
    adapted to the fixture schema, which has no partsupp: supply cost
    is modeled as 10% of retail price per unit): profit by supplier
    nation and order year over a name-filtered part slice. The derived
    per-row measure (revenue − cost) is ONE double expression quantized
    to decimal(38,6) — identical on both engines — then summed exactly;
    nation (scale-constant) is hint-broadcast, while part and supplier
    are SF-proportional and stay unhinted (AQE broadcasts them at test
    SFs), so the fact flows through one grouped exchange at test scale
    and the plan degrades gracefully to shuffle joins at 100×.
    The `p_name LIKE '%gi%'` predicate prunes the part build
    side before the join (pushed to the dimension scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("gi"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(amount.cast("decimal(38,6)"))
            .cast("double")
            .alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
