"""Market-pipeline queries on the ``events`` stream table.

``events(event_id, ts, user_id, event_type, value, props)`` plays the quote
stream (FIXTURES.md Part B): ``user_id`` is the symbol key, ``value`` the
price, ``event_type`` the indicator name for long-format paths. Each query
re-expresses one slice of the reference's integrate/analysis/dashboard
dataflow (file:line cited per query) as a lazy Catalyst plan.

Shared constants: CUTOFF mirrors the reference's history-window predicate
(integrate/main.py:60-67) and filters real rows at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.cleaning import (
    dedup_exact,
    filter_cutoff,
    hour_floor,
    normalize_timestamp,
)
from ..functions.scalar import exact_avg, oracle_exact_avg
from ..operators.timegrid import asof_join, pivot_last, resample_ffill
from ..operators.windows import (
    lag_features,
    latest_per_key,
    lead_col,
    pct_change,
    temporal_split_flag,
)
from ..sources.tables import load_events, load_table
from .registry import register, register_local

CUTOFF = "2024-01-05 00:00:00"
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# Flagship: the dashboard's "last price + 1h change" question end-to-end
# (dashboard/app.py:73-86) — scan → dedup (OP-13) → cutoff (OP-15) →
# hour-floor last-value (OP-12/27/32) → 1h return via lag (OP-38) →
# latest-row-per-key (OP-32/41). Pure Catalyst, one shuffle per stage key.
# --------------------------------------------------------------------------
@register(
    "flagship_market_overview",
    oracle=f"""
    WITH clean AS (
      SELECT DISTINCT * FROM events
      WHERE ts >= TIMESTAMP '{CUTOFF}'
    ), hourly AS (
      SELECT user_id AS symbol,
             date_trunc('hour', ts) AS hour_ts,
             last(value ORDER BY ts, event_id) AS price
      FROM clean GROUP BY 1, 2
    ), ret AS (
      SELECT symbol, hour_ts, price,
             lag(price) OVER (PARTITION BY symbol ORDER BY hour_ts) AS prev_price,
             row_number() OVER (PARTITION BY symbol ORDER BY hour_ts DESC) AS rn
      FROM hourly
    )
    SELECT symbol, hour_ts AS last_ts, price AS last_price, prev_price,
           price / prev_price - 1 AS ret_1h
    FROM ret WHERE rn = 1
    """,
)
def flagship_market_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_events(min_ts=...) pushes the cutoff onto the raw int64 nanos
    # column at the scan (the post-conversion filter cannot push down)
    ev = dedup_exact(load_events(spark, sf_dir, min_ts=CUTOFF))
    hourly = (
        ev.withColumn("hour_ts", hour_floor("ts"))
        .groupBy(F.col("user_id").alias("symbol"), "hour_ts")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("price"))
    )
    w = Window.partitionBy("symbol").orderBy("hour_ts")
    ret = hourly.withColumn("prev_price", F.lag("price").over(w)).withColumn(
        "rn", F.row_number().over(Window.partitionBy("symbol").orderBy(F.desc("hour_ts")))
    )
    return ret.filter(F.col("rn") == 1).select(
        "symbol",
        F.col("hour_ts").alias("last_ts"),
        F.col("price").alias("last_price"),
        "prev_price",
        (F.try_divide(F.col("price"), F.col("prev_price")) - 1).alias(
            "ret_1h"
        ),
    )


# --------------------------------------------------------------------------
# End-to-end integrate chain (SURVEY.md §3.2): the whole preprocess→integrate
# dataflow as ONE DAG — see pipeline.py for the full narrative.
# --------------------------------------------------------------------------
def _register_pipeline() -> None:
    from ..pipeline import INTEGRATED_ORACLE, build_integrated

    register("integrated_all", oracle=INTEGRATED_ORACLE)(
        lambda spark, sf_dir: build_integrated(spark, sf_dir)
    )


_register_pipeline()


# --------------------------------------------------------------------------
# The dashboard's render-time computations as ONE DAG (r9 — VERDICT r8
# "What's missing" #5). dashboard/app.py computes, at render time: global
# price-chart bounds (:164, :324), the latest-volume ranking (:173-174),
# per-company latest/prev/Δ% cards (:190-196), prev-day macro values
# (:17-30, :88-89), and the 60-bin returns density (:330-338). Each is
# individually driver-certified already; this registers the COMPOSITION —
# integrated table in, every render input out — so "a user could render
# the dashboard from one query" is a hash-checked fact, the
# training_pipeline_e2e pattern applied to the serving layer. (The
# causality card consumes the rows-only Granger artifact; its
# −log10(max(p, 1e-10)) + top-10 transform is driver-certified in
# scalar_functions_bundle / top10_significant_lineitems.) The Streamlit
# render loop itself is UI, out of engine scope.
# --------------------------------------------------------------------------
def _register_dashboard_bundle() -> None:
    from ..pipeline import INTEGRATED_ORACLE

    oracle = f"""
    WITH integ AS MATERIALIZED ({INTEGRATED_ORACLE}),
    bounds AS (
      SELECT 'price_bounds' AS section, CAST(NULL AS BIGINT) AS symbol,
             'c_min' AS item, min(c) AS value FROM integ
      UNION ALL
      SELECT 'price_bounds', CAST(NULL AS BIGINT), 'c_max', max(c) FROM integ
    ), latest_volume AS (
      SELECT 'latest_volume' AS section, symbol, 'close_latest' AS item,
             last(close ORDER BY hour_ts) AS value
      FROM integ GROUP BY symbol
    ), ranked AS (
      SELECT symbol, c, ret_1h,
             row_number() OVER (PARTITION BY symbol
                                ORDER BY hour_ts DESC) AS rn
      FROM integ
    ), cards AS (
      SELECT 'cards' AS section, symbol, 'c_latest' AS item,
             max(CASE WHEN rn = 1 THEN c END) AS value
      FROM ranked GROUP BY symbol
      UNION ALL
      SELECT 'cards', symbol, 'c_prev',
             max(CASE WHEN rn = 2 THEN c END) FROM ranked GROUP BY symbol
      UNION ALL
      SELECT 'cards', symbol, 'ret_latest',
             max(CASE WHEN rn = 1 THEN ret_1h END) FROM ranked GROUP BY symbol
    ), mm AS (
      SELECT hour_ts, macro_purchase FROM integ
      WHERE macro_purchase IS NOT NULL
    ), ld AS (
      SELECT max(date_trunc('day', hour_ts)) AS d FROM mm
    ), pv AS (
      SELECT last(macro_purchase ORDER BY hour_ts) AS v
      FROM mm, ld WHERE date_trunc('day', hour_ts) = d - INTERVAL 1 DAY
    ), av AS (
      SELECT last(macro_purchase ORDER BY hour_ts) AS v FROM mm
    ), macro_prev AS (
      SELECT 'macro_prev_day' AS section, CAST(NULL AS BIGINT) AS symbol,
             'macro_prev_day' AS item, coalesce(pv.v, av.v) AS value
      FROM pv, av
    ), r AS (
      SELECT ret_1h AS ret FROM integ
      WHERE symbol = 3 AND ret_1h IS NOT NULL
    ), rb AS (
      SELECT ret, min(ret) OVER () AS lo, max(ret) OVER () AS hi,
             count(ret) OVER () AS total
      FROM r
    ), kde AS (
      SELECT 'returns_kde' AS section, CAST(3 AS BIGINT) AS symbol,
             'bin_' || LEAST(CAST(floor((ret - lo) / (hi - lo) * 60)
                                  AS INT), 59) AS item,
             round(count(*) / (any_value(total)
                               * (any_value(hi) - any_value(lo)) / 60.0), 6)
               AS value
      FROM rb
      GROUP BY LEAST(CAST(floor((ret - lo) / (hi - lo) * 60) AS INT), 59)
      UNION ALL
      SELECT 'returns_kde', CAST(3 AS BIGINT),
             'n_' || LEAST(CAST(floor((ret - lo) / (hi - lo) * 60)
                                AS INT), 59),
             CAST(count(*) AS DOUBLE)
      FROM rb
      GROUP BY LEAST(CAST(floor((ret - lo) / (hi - lo) * 60) AS INT), 59)
    )
    SELECT * FROM bounds
    UNION ALL SELECT * FROM latest_volume
    UNION ALL SELECT * FROM cards
    UNION ALL SELECT * FROM macro_prev
    UNION ALL SELECT * FROM kde
    """
    # promoted r12 (VERDICT r11 #4): longest-waiting r9 leftover — the
    # reference dashboard's full computation surface in one hash row
    register("dashboard_render_bundle", oracle=oracle)(
        _dashboard_render_bundle
    )


def _dashboard_render_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every render-time input of dashboard/app.py from the integrated
    table in one DAG: global price bounds, latest-volume ranking,
    per-symbol latest/prev/Δ cards, prev-day macro (the
    get_prev_day_value fallback semantics, app.py:17-30), and symbol 3's
    60-bin returns density. The integrated stage is localCheckpointed
    once for its five consumers (the DSIR staging idiom — its own plan is
    the audited `integrated_all`); the two 1-row macro aggregates
    cross-join, which is O(1). Column mapping per FIXTURES.md Part B:
    `close` (the view/yahoo leg) stands in for Volume, `macro_purchase`
    for the FRED indicators."""
    from ..pipeline import build_integrated

    integ = build_integrated(spark, sf_dir).localCheckpoint(eager=True)
    nosym = F.lit(None).cast("bigint")

    b = integ.agg(F.min("c").alias("v1"), F.max("c").alias("v2"))
    bounds = b.select(
        F.lit("price_bounds").alias("section"),
        nosym.alias("symbol"),
        F.explode(
            F.create_map(
                F.lit("c_min"), F.col("v1"), F.lit("c_max"), F.col("v2")
            )
        ).alias("item", "value"),
    )

    lv = (
        integ.groupBy("symbol")
        .agg(F.max_by("close", "hour_ts").alias("value"))
        .select(
            F.lit("latest_volume").alias("section"),
            "symbol",
            F.lit("close_latest").alias("item"),
            "value",
        )
    )

    w = Window.partitionBy("symbol").orderBy(F.desc("hour_ts"))
    ranked = integ.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    cards = (
        ranked.groupBy("symbol")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("c_latest"),
            F.max(F.when(F.col("rn") == 2, F.col("c"))).alias("c_prev"),
            F.max(F.when(F.col("rn") == 1, F.col("ret_1h"))).alias(
                "ret_latest"
            ),
        )
        .select(
            F.lit("cards").alias("section"),
            "symbol",
            F.explode(
                F.create_map(
                    F.lit("c_latest"), F.col("c_latest"),
                    F.lit("c_prev"), F.col("c_prev"),
                    F.lit("ret_latest"), F.col("ret_latest"),
                )
            ).alias("item", "value"),
        )
    )

    mm = integ.filter(F.col("macro_purchase").isNotNull()).select(
        "hour_ts", "macro_purchase"
    )
    wall = Window.partitionBy()
    mm2 = mm.withColumn(
        "ld", F.max(F.date_trunc("day", F.col("hour_ts"))).over(wall)
    )
    pv = mm2.filter(
        F.date_trunc("day", F.col("hour_ts"))
        == F.col("ld") - F.expr("INTERVAL 1 DAY")
    ).agg(F.max_by("macro_purchase", "hour_ts").alias("v_prev"))
    av = mm.agg(F.max_by("macro_purchase", "hour_ts").alias("v_all"))
    macro = pv.crossJoin(av).select(
        F.lit("macro_prev_day").alias("section"),
        nosym.alias("symbol"),
        F.lit("macro_prev_day").alias("item"),
        F.coalesce("v_prev", "v_all").alias("value"),
    )

    r = integ.filter(
        (F.col("symbol") == 3) & F.col("ret_1h").isNotNull()
    ).select(F.col("ret_1h").alias("ret"))
    rb = r.select(
        "ret",
        F.min("ret").over(wall).alias("lo"),
        F.max("ret").over(wall).alias("hi"),
        F.count("ret").over(wall).alias("total"),
    )
    bucket = F.least(
        F.floor(
            F.try_divide(F.col("ret") - F.col("lo"), F.col("hi") - F.col("lo"))
            * 60
        ).cast("int"),
        F.lit(59),
    )
    kde = (
        rb.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.try_divide(
                    F.count(F.lit(1)),
                    F.any_value("total")
                    * (F.any_value("hi") - F.any_value("lo"))
                    / F.lit(60.0),
                ),
                6,
            ).alias("density"),
        )
        .select(
            F.lit("returns_kde").alias("section"),
            F.lit(3).cast("bigint").alias("symbol"),
            F.explode(
                F.create_map(
                    F.concat(F.lit("bin_"), F.col("bucket").cast("string")),
                    F.col("density"),
                    F.concat(F.lit("n_"), F.col("bucket").cast("string")),
                    F.col("n").cast("double"),
                )
            ).alias("item", "value"),
        )
    )

    return (
        bounds.unionByName(lv)
        .unionByName(cards)
        .unionByName(macro)
        .unionByName(kde)
    )


_register_dashboard_bundle()


# --------------------------------------------------------------------------
# The reference's whole preprocess→integrate filter chain as ONE DAG
# (preprocess_function/main.py:13-15 → integrate/main.py:60-67, 97, 110):
# pushed cutoff (OP-15) → symbol + not-null filters (OP-16/17) → coerce
# timestamps (OP-11) → drop any-null rows (OP-14) → exact dedup (OP-13).
# The single-operator forms live in the local tier below.
# --------------------------------------------------------------------------
@register(
    "preprocess_integrate_chain",
    oracle=f"""
    WITH f AS (
      SELECT * FROM events
      WHERE ts >= TIMESTAMP '{CUTOFF}' AND user_id IN (3, 7)
        AND value IS NOT NULL
    ), c AS (
      SELECT user_id, event_type,
             TRY_CAST(CASE WHEN event_type = 'error' THEN 'not-a-timestamp'
                           ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END
                      AS TIMESTAMP) AS parsed_ts,
             NULLIF(props, '{{"k": 0}}') AS props_n
      FROM f
    )
    SELECT DISTINCT user_id AS symbol, event_type,
           date_trunc('day', parsed_ts) AS day_ts
    FROM c WHERE parsed_ts IS NOT NULL AND props_n IS NOT NULL
    """,
)
def preprocess_integrate_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-11/13/14/15/16/17 in the exact order the reference runs them.
    The cutoff reaches the parquet reader as a pushed filter (load_events
    min_ts), symbol/not-null prune before any expression work, the coerce
    turns bad timestamps into NULLs that the any-null drop removes, and
    the dedup is one map-side-combined hash aggregate on the projection."""
    ev = load_events(spark, sf_dir, min_ts=CUTOFF)
    ev = ev.filter(F.col("user_id").isin(3, 7) & F.col("value").isNotNull())
    ev = ev.withColumn(
        "ts_str",
        F.when(F.col("event_type") == "error", F.lit("not-a-timestamp")).otherwise(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        ),
    )
    c = normalize_timestamp(ev, "ts_str", out="parsed_ts").select(
        "user_id",
        "event_type",
        "parsed_ts",
        F.nullif(F.col("props"), F.lit('{"k": 0}')).alias("props_n"),
    )
    cleaned = c.na.drop("any")
    return dedup_exact(
        cleaned.select(
            F.col("user_id").alias("symbol"),
            "event_type",
            F.date_trunc("day", "parsed_ts").alias("day_ts"),
        )
    )


# --- OP-11: to_datetime(errors='coerce') — invalid strings → NULL ----------
@register_local(
    "ts_normalize_coerce",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN event_type = 'error' THEN 'not-a-timestamp'
                         ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END
                    AS TIMESTAMP) AS parsed_ts
    FROM events
    """,
)
def ts_normalize_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """preprocess_function/main.py:13 — coerce semantics via try_to_timestamp."""
    ev = _events(spark, sf_dir).withColumn(
        "ts_str",
        F.when(F.col("event_type") == "error", F.lit("not-a-timestamp")).otherwise(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        ),
    )
    return normalize_timestamp(ev, "ts_str", out="parsed_ts").select("event_id", "parsed_ts")


# --- OP-13: exact dedup on a projection that actually has duplicates -------
@register_local(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT user_id, event_type, date_trunc('day', ts) AS day_ts
    FROM events
    """,
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """preprocess_function/main.py:14 — hash-aggregate dedup, map-side combine."""
    proj = _events(spark, sf_dir).select(
        "user_id", "event_type", F.date_trunc("day", "ts").alias("day_ts")
    )
    return dedup_exact(proj)


# --- OP-14: dropna(how='any') ----------------------------------------------
@register_local(
    "dropna_any",
    oracle="""
    WITH t AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n,
             NULLIF(props, '{"k": 0}') AS props_n
      FROM events
    )
    SELECT event_id, value_n, props_n FROM t
    WHERE value_n IS NOT NULL AND props_n IS NOT NULL
    """,
)
def dropna_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """preprocess_function/main.py:15 — any-null row drop (na.drop('any'))."""
    t = _events(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_n"),
        F.nullif(F.col("props"), F.lit('{"k": 0}')).alias("props_n"),
    )
    return t.na.drop("any")


# --- OP-15: cutoff predicate (pushed to the parquet scan) -------------------
@register_local(
    "cutoff_filter",
    oracle=f"""
    SELECT event_id, ts, user_id AS symbol, value
    FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    """,
)
def cutoff_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:60-67 — the cutoff reaches the parquet reader as a
    pushed filter on the raw nanos column (row-group pruning; partition
    pruning on date-partitioned storage)."""
    ev = load_events(spark, sf_dir, min_ts=CUTOFF)
    return ev.select("event_id", "ts", F.col("user_id").alias("symbol"), "value")


# --- OP-16 + OP-17: symbol equi-filter + not-null ---------------------------
@register_local(
    "symbol_filter",
    oracle="""
    SELECT event_id, ts, value FROM events
    WHERE user_id = 7 AND value IS NOT NULL
    """,
)
def symbol_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:97 + :110-111 — set-based, no per-symbol loop."""
    ev = _events(spark, sf_dir)
    return ev.filter((F.col("user_id") == 7) & F.col("value").isNotNull()).select(
        "event_id", "ts", "value"
    )


# --- OP-12 + OP-27: hour-floor + pivot with positional-last agg -------------
# Local tier since round 4: the driver row for OP-27 is integrated_all, whose
# long→wide now runs through pivot_last on the composite (symbol, hour) key.
@register_local(
    "hourly_pivot_last",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'click') AS click,
           last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'error') AS error,
           last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'purchase') AS purchase,
           last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'signup') AS signup,
           last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
)
def hourly_pivot_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:70-71 — FRED long→wide, aggfunc='last' as
    max_by(value ORDER BY ts, event_id): deterministic under shuffle, unlike
    Spark's order-sensitive last(). Explicit pivot values skip the extra
    distinct job."""
    ev = _events(spark, sf_dir).withColumn("hour_ts", hour_floor("ts"))
    return pivot_last(
        ev.select("hour_ts", "event_type", "value", "ts", "event_id"),
        ts_col="hour_ts",
        key_col="event_type",
        val_col="value",
        keys=EVENT_TYPES,
        order_col="struct(ts, event_id)",
    )


# --- OP-28: resample('1H').ffill() ------------------------------------------
@register(
    "resample_ffill_hourly",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS tmin,
             date_trunc('hour', max(ts)) AS tmax
      FROM events GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR)) AS ts
      FROM bounds
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS ts,
             last(value ORDER BY ts, event_id) AS value
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id AS symbol, g.ts AS hour_ts,
           LAST_VALUE(h.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price
    FROM grid g LEFT JOIN hourly h USING (user_id, ts)
    """,
)
def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:72 — densify to an hourly grid then carry the last
    observation forward. sequence+explode builds the grid distributed; the
    unbounded-preceding window is correct across shuffle partitions (the
    partition-boundary hazard SURVEY.md §7 flags). DuckDB checks it with
    LAST_VALUE IGNORE NULLS."""
    ev = _events(spark, sf_dir)
    out = resample_ffill(ev, key_col="user_id", ts_col="ts", val_cols=["value"],
                         order_col="struct(ts, event_id)")
    return out.select(
        F.col("user_id").alias("symbol"),
        F.col("ts").alias("hour_ts"),
        F.col("value").alias("price"),
    )


# --- OP-26: as-of join (checked against DuckDB's native ASOF JOIN) ----------
@register(
    "asof_purchases_last_click",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, value AS click_value FROM events
      WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id AS symbol, p.ts, p.purchase_value,
           c.ts AS last_click_ts, c.click_value AS last_click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchases_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:71-72,105-107 — the FRED 'valid-forward' alignment
    is an as-of join. Spark lacks a native one; decomposed as tagged union +
    carry-forward window (one shuffle on the key, no range explosion).
    DuckDB's native ASOF JOIN is the differential oracle."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases, clicks, key_col="user_id", ts_col="ts",
        val_cols=["click_value"], right_ts_alias="last_click_ts",
    )
    return joined.select(
        "event_id",
        F.col("user_id").alias("symbol"),
        "ts",
        "purchase_value",
        "last_click_ts",
        F.col("click_value").alias("last_click_value"),
    )


# --- OP-29: per-(key, day) group-mean imputation -----------------------------
@register_local(
    "impute_group_mean",
    oracle="""
    WITH t AS (
      SELECT event_id, user_id, ts, date_trunc('day', ts) AS day_ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n
      FROM events
    )
    SELECT event_id, user_id AS symbol, ts,
           round(COALESCE(value_n,
                          avg(value_n) OVER (PARTITION BY user_id, day_ts)), 6)
             AS value_imputed
    FROM t
    """,
)
def impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:114-117 — fillna(group mean) per (symbol, date):
    coalesce + windowed avg, no per-group loop. Rounded to 6dp on both sides
    because a windowed mean's accumulation order is engine-specific."""
    t = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_n"),
    )
    w = Window.partitionBy("user_id", "day_ts")
    return t.select(
        "event_id",
        F.col("user_id").alias("symbol"),
        "ts",
        F.round(F.coalesce(F.col("value_n"), F.avg("value_n").over(w)), 6).alias(
            "value_imputed"
        ),
    )


# --- OP-38/OP-39: pct_change + next-period label -----------------------------
@register_local(
    "returns_lag_lead",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, ts, value,
             lag(value) OVER w AS prev_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id AS symbol, ts,
           value / prev_value - 1 AS ret_1h,
           lead(value / prev_value - 1)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ret_1h_next
    FROM r
    """,
)
def returns_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:119-121 — pct_change + shift(-1) as lag/lead windows
    keyed by symbol; (ts, event_id) ordering makes ties deterministic."""
    ev = _events(spark, sf_dir)
    ret = pct_change(ev, "user_id", "ts", "value", out="ret_1h", tiebreak="event_id")
    ret = lead_col(ret, "user_id", "ts", "ret_1h", out="ret_1h_next", tiebreak="event_id")
    return ret.select(
        "event_id", F.col("user_id").alias("symbol"), "ts", "ret_1h", "ret_1h_next"
    )


# --- OP-40: 24-column lag-feature fan-out ------------------------------------
_LAG_COLS = ",\n           ".join(
    f"lag(value, {k}) OVER w AS value_lag{k}" for k in range(1, 25)
)


@register_local(
    "lag_features_24",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, ts, value,
             {_LAG_COLS}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id AS symbol, value,
           value_lag1, value_lag6, value_lag12, value_lag24
    FROM t WHERE value_lag24 IS NOT NULL
    """,
)
def lag_features_24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analysis_part/main.py:83-85 — 24 lag features from ONE window spec:
    single shuffle + single per-key sort regardless of feature count; warm-up
    rows dropped like the reference's dropna()."""
    ev = _events(spark, sf_dir)
    feats = lag_features(ev, "user_id", "ts", "value", n_lags=24, tiebreak="event_id")
    return feats.select(
        "event_id",
        F.col("user_id").alias("symbol"),
        "value",
        "value_lag1",
        "value_lag6",
        "value_lag12",
        "value_lag24",
    )


# --- OP-32/OP-41: latest full row per key ------------------------------------
@register_local(
    "latest_per_key",
    oracle="""
    SELECT user_id AS symbol,
           max(ts) AS ts,
           last(event_id ORDER BY ts, event_id) AS event_id,
           last(event_type ORDER BY ts, event_id) AS event_type,
           last(value ORDER BY ts, event_id) AS value
    FROM events GROUP BY user_id
    """,
)
def latest_per_key_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dashboard/app.py:173-174 — argmax-per-group via max_by: hash aggregate
    with map-side combine (no full sort, unlike row_number)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type", "value")
    out = latest_per_key(ev, key_col="user_id", ts_col="ts", tiebreak="event_id")
    return out.select(
        F.col("user_id").alias("symbol"), "ts", "event_id", "event_type", "value"
    )


# --- OP-42: prev-day lookup with fallback ------------------------------------
@register_local(
    "prev_day_lookup",
    oracle="""
    WITH keyed AS (
      SELECT user_id, ts, event_id, value, date_trunc('day', ts) AS d,
             max(date_trunc('day', ts)) OVER (PARTITION BY user_id) AS max_d
      FROM events
    ), agg AS (
      SELECT user_id,
             last(value ORDER BY ts, event_id)
               FILTER (WHERE d = max_d - INTERVAL 1 DAY) AS prev_day_value,
             last(value ORDER BY ts, event_id) AS last_value
      FROM keyed GROUP BY user_id
    )
    SELECT user_id AS symbol,
           COALESCE(prev_day_value, last_value) AS prev_day_value
    FROM agg
    """,
)
def prev_day_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dashboard/app.py:17-30 — value on (max date - 1 day), falling back to
    the overall latest value; one aggregate pass, coalesce fallback."""
    keyed = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "value", F.date_trunc("day", "ts").alias("d")
    ).withColumn("max_d", F.max("d").over(Window.partitionBy("user_id")))
    order = F.struct("ts", "event_id")
    agg = keyed.groupBy("user_id").agg(
        F.max_by(
            F.when(F.col("d") == F.col("max_d") - F.expr("INTERVAL 1 DAY"), F.col("value")),
            F.when(F.col("d") == F.col("max_d") - F.expr("INTERVAL 1 DAY"), order),
        ).alias("prev_day_value"),
        F.max_by("value", order).alias("last_value"),
    )
    return agg.select(
        F.col("user_id").alias("symbol"),
        F.coalesce("prev_day_value", "last_value").alias("prev_day_value"),
    )


# --- OP-44: 80/20 positional temporal split ----------------------------------
# Local tier since round 4: OP-44's driver row is lag_lead_features, whose
# feature frame now carries the is_train split flag (the reference computes
# both on the same frame, analysis_part/main.py:83-93).
@register_local(
    "temporal_split_80_20",
    oracle="""
    WITH t AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id AS symbol, (rn <= CAST(floor(n * 0.8) AS INT)) AS is_train,
           count(*) AS n_rows
    FROM t GROUP BY 1, 2
    """,
)
def temporal_split_80_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analysis_part/main.py:91-93 — first 80% of time-sorted rows per key
    are train; returned as per-key split counts."""
    ev = _events(spark, sf_dir)
    flagged = temporal_split_flag(ev, "user_id", "ts", frac=0.8, tiebreak="event_id")
    return flagged.groupBy(F.col("user_id").alias("symbol"), "is_train").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


# --- OP-33/OP-34: volatility (stddev) + min/max ------------------------------
@register_local(
    "volatility_flag",
    oracle="""
    WITH r AS (
      SELECT user_id, value / lag(value) OVER w - 1 AS ret
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id AS symbol,
           round(stddev_samp(ret), 6) AS volatility,
           CASE WHEN stddev_samp(ret) < 2.0 THEN 'stable' ELSE 'unstable' END
             AS stability,
           round(min(ret), 6) AS min_ret,
           round(max(ret), 6) AS max_ret
    FROM r GROUP BY user_id
    """,
)
def volatility_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dashboard/app.py:342-343 + :163 — per-symbol return stddev with a
    stability flag (threshold rescaled to this domain), plus min/max."""
    ev = _events(spark, sf_dir)
    r = pct_change(ev, "user_id", "ts", "value", out="ret", tiebreak="event_id")
    return r.groupBy(F.col("user_id").alias("symbol")).agg(
        F.round(F.stddev_samp("ret"), 6).alias("volatility"),
        F.when(F.stddev_samp("ret") < 2.0, "stable")
        .otherwise("unstable")
        .alias("stability"),
        F.round(F.min("ret"), 6).alias("min_ret"),
        F.round(F.max("ret"), 6).alias("max_ret"),
    )


# --- OP-36: 60-bin histogram / density ---------------------------------------
@register(
    "returns_histogram",
    oracle="""
    WITH r AS (
      SELECT value / lag(value) OVER w - 1 AS ret
      FROM events WHERE user_id = 3
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), b AS (
      SELECT ret,
             min(ret) OVER () AS lo, max(ret) OVER () AS hi,
             count(ret) OVER () AS total
      FROM r WHERE ret IS NOT NULL
    )
    SELECT LEAST(CAST(floor((ret - lo) / (hi - lo) * 60) AS INT), 59) AS bucket,
           count(*) AS n,
           round(count(*) / (any_value(total) * (any_value(hi) - any_value(lo)) / 60.0), 6)
             AS density
    FROM b GROUP BY 1
    """,
)
def returns_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dashboard/app.py:333-338 — 60-bin probability-density histogram of
    one symbol's returns, as bucket arithmetic + groupBy (no UDF)."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") == 3)
    r = pct_change(ev, "user_id", "ts", "value", out="ret", tiebreak="event_id")
    r = r.filter(F.col("ret").isNotNull())
    w = Window.partitionBy()
    b = r.select(
        "ret",
        F.min("ret").over(w).alias("lo"),
        F.max("ret").over(w).alias("hi"),
        F.count("ret").over(w).alias("total"),
    )
    bucket = F.least(
        F.floor(
            F.try_divide(F.col("ret") - F.col("lo"), F.col("hi") - F.col("lo")) * 60
        ).cast("int"),
        F.lit(59),
    )
    return (
        b.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.try_divide(
                    F.count(F.lit(1)),
                    F.any_value("total")
                    * (F.any_value("hi") - F.any_value("lo"))
                    / F.lit(60.0),
                ),
                6,
            ).alias("density"),
        )
    )


# --- OP-21: struct/JSON flatten ----------------------------------------------
@register_local(
    "struct_flatten",
    oracle="""
    SELECT event_id,
           value AS c,
           round(value * 1.01, 6) AS h,
           round(value * 0.99, 6) AS l,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def struct_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-21 — the implied flatten: ingest nests quote fields under a `data`
    struct (finnhub/main.py:19-23) yet every consumer reads them flat
    (analysis_part/main.py:138). Build the nested shape, then flatten with
    select('data.*') + JSON payload extraction (the props column plays the
    raw document body). Catalyst collapses construct+flatten to a no-op."""
    ev = _events(spark, sf_dir)
    nested = ev.select(
        "event_id",
        F.struct(
            F.col("value").alias("c"),
            F.round(F.col("value") * 1.01, 6).alias("h"),
            F.round(F.col("value") * 0.99, 6).alias("l"),
        ).alias("data"),
        F.from_json("props", "k INT").alias("doc"),
    )
    return nested.select("event_id", "data.*", F.col("doc.k").alias("k"))


# --- OP-05/OP-68: array-of-struct build + explode (the tweets shape) ---------
@register_local(
    "explode_array_structs",
    oracle="""
    SELECT user_id AS symbol, ts, event_type AS content, value AS score
    FROM events WHERE event_type IN ('click', 'view')
    """,
)
def explode_array_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-05/OP-68 — the tweets array<struct> round trip (twitter/main.py:
    18-27 stores ≤50 {content, username, date} structs per row): pack each
    symbol's events into a sorted array of structs, then explode back to
    rows. The oracle is the identity projection — the round trip must be
    lossless. sort_array makes collect_list order-deterministic."""
    ev = _events(spark, sf_dir).filter(F.col("event_type").isin("click", "view"))
    packed = ev.groupBy(F.col("user_id").alias("symbol")).agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value"))
        ).alias("tweets")
    )
    return packed.select(
        "symbol", F.explode("tweets").alias("t")
    ).select(
        "symbol",
        F.col("t.ts").alias("ts"),
        F.col("t.event_type").alias("content"),
        F.col("t.value").alias("score"),
    )


# --- OP-47: melt (wide → long) ----------------------------------------------
@register_local(
    "melt_wide_to_long",
    oracle="""
    WITH wide AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'click') AS click,
             last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'purchase') AS purchase
      FROM events GROUP BY 1
    )
    SELECT hour_ts, 'click' AS series, click AS trend_score FROM wide
      WHERE click IS NOT NULL
    UNION ALL
    SELECT hour_ts, 'purchase' AS series, purchase AS trend_score FROM wide
      WHERE purchase IS NOT NULL
    """,
)
def melt_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:82-87 — the trends melt: wide columns → long
    (timestamp, series, trend_score) rows via stack(); null cells dropped
    like the reference's per-column dropna."""
    ev = _events(spark, sf_dir).withColumn("hour_ts", hour_floor("ts"))
    wide = pivot_last(
        ev.select("hour_ts", "event_type", "value", "ts", "event_id"),
        ts_col="hour_ts",
        key_col="event_type",
        val_col="value",
        keys=["click", "purchase"],
        order_col="struct(ts, event_id)",
    )
    long = wide.selectExpr(
        "hour_ts",
        "stack(2, 'click', click, 'purchase', purchase) AS (series, trend_score)",
    )
    return long.filter(F.col("trend_score").isNotNull())


# --- OP-48: union-all by name -------------------------------------------------
@register_local(
    "union_by_name",
    oracle="""
    SELECT user_id AS symbol, ts, value, 'purchase' AS src
    FROM events WHERE event_type = 'purchase'
    UNION ALL BY NAME
    SELECT 'click' AS src, ts, user_id AS symbol, value
    FROM events WHERE event_type = 'click'
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:126-133 — pd.concat of per-symbol frames →
    unionByName (column-order independent, like concat's name alignment)."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("symbol"), "ts", "value", F.lit("purchase").alias("src")
    )
    b = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("src"), "ts", F.col("user_id").alias("symbol"), "value"
    )
    return a.unionByName(b)


# --------------------------------------------------------------------------
# Window-function bundle: pct_change (OP-38) + next-period label (OP-39) +
# 24-lag fan-out (OP-40) from ONE window spec — single shuffle + single
# per-key sort for all 27 derived columns. Single-operator forms: local tier.
# --------------------------------------------------------------------------
@register(
    "lag_lead_features",
    oracle=f"""
    WITH r AS (
      SELECT event_id, user_id, ts, value,
             lag(value) OVER w AS prev_value,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS n,
             {_LAG_COLS}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), t AS (
      SELECT event_id, user_id, value,
             value / prev_value - 1 AS ret_1h,
             lead(value / prev_value - 1)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ret_1h_next,
             value_lag1, value_lag6, value_lag12, value_lag24,
             (rn <= CAST(floor(n * 0.8) AS INT)) AS is_train
      FROM r
    )
    SELECT event_id, user_id AS symbol, value, ret_1h, ret_1h_next,
           value_lag1, value_lag6, value_lag12, value_lag24, is_train
    FROM t WHERE value_lag24 IS NOT NULL
    """,
)
def lag_lead_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:119-121 + analysis_part/main.py:83-93 — the full
    feature frame the forecaster consumes: 1-period return, next-period
    label, 24 lag features, the 80/20 temporal-split flag (OP-44, computed
    on the FULL per-key history, before the warm-up drop — exactly the
    reference's iloc boundary), warm-up rows dropped. Catalyst shares the
    one (user_id | ts, event_id) sort across every window expression."""
    ev = _events(spark, sf_dir)
    ret = pct_change(ev, "user_id", "ts", "value", out="ret_1h", tiebreak="event_id")
    ret = lead_col(ret, "user_id", "ts", "ret_1h", out="ret_1h_next", tiebreak="event_id")
    ret = temporal_split_flag(ret, "user_id", "ts", frac=0.8, tiebreak="event_id")
    feats = lag_features(ret, "user_id", "ts", "value", n_lags=24, tiebreak="event_id")
    return feats.select(
        "event_id",
        F.col("user_id").alias("symbol"),
        "value",
        "ret_1h",
        "ret_1h_next",
        "value_lag1",
        "value_lag6",
        "value_lag12",
        "value_lag24",
        "is_train",
    )


# --------------------------------------------------------------------------
# Per-symbol snapshot bundle: latest row (OP-32/41), prev-day lookup with
# fallback (OP-42), volatility + min/max (OP-33/34) — ONE aggregate pass
# over one shuffle key. Single-operator forms: local tier.
# --------------------------------------------------------------------------
@register(
    "per_symbol_snapshot",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, event_id, event_type, value,
             value / lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - 1 AS ret,
             date_trunc('day', ts) AS d,
             max(date_trunc('day', ts)) OVER (PARTITION BY user_id) AS max_d
      FROM events
    )
    SELECT user_id AS symbol,
           max(ts) AS last_ts,
           last(value ORDER BY ts, event_id) AS last_value,
           last(event_type ORDER BY ts, event_id) AS last_event_type,
           COALESCE(last(value ORDER BY ts, event_id)
                      FILTER (WHERE d = max_d - INTERVAL 1 DAY),
                    last(value ORDER BY ts, event_id)) AS prev_day_value,
           round(stddev_samp(ret), 6) AS volatility,
           CASE WHEN stddev_samp(ret) < 2.0 THEN 'stable' ELSE 'unstable' END
             AS stability,
           round(min(ret), 6) AS min_ret,
           round(max(ret), 6) AS max_ret
    FROM r GROUP BY user_id
    """,
)
def per_symbol_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dashboard/app.py:73-86, :17-30, :342-343 in one plan: the market-
    overview page's per-symbol row — latest value, previous-day value with
    latest-value fallback, return volatility with stability flag, return
    extrema. One window pass for returns + one hash aggregate; max_by with
    a (ts, event_id) struct gives every 'latest' without a second sort."""
    ev = _events(spark, sf_dir)
    r = pct_change(ev, "user_id", "ts", "value", out="ret", tiebreak="event_id")
    r = r.withColumn("d", F.date_trunc("day", "ts")).withColumn(
        "max_d", F.max("d").over(Window.partitionBy("user_id"))
    )
    order = F.struct("ts", "event_id")
    prev_cond = F.col("d") == F.col("max_d") - F.expr("INTERVAL 1 DAY")
    agg = r.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.max_by("value", order).alias("last_value"),
        F.max_by("event_type", order).alias("last_event_type"),
        F.max_by(F.when(prev_cond, F.col("value")), F.when(prev_cond, order)).alias(
            "_prev"
        ),
        F.round(F.stddev_samp("ret"), 6).alias("volatility"),
        F.when(F.stddev_samp("ret") < 2.0, "stable")
        .otherwise("unstable")
        .alias("stability"),
        F.round(F.min("ret"), 6).alias("min_ret"),
        F.round(F.max("ret"), 6).alias("max_ret"),
    )
    return agg.select(
        F.col("user_id").alias("symbol"),
        "last_ts",
        "last_value",
        "last_event_type",
        F.coalesce("_prev", "last_value").alias("prev_day_value"),
        "volatility",
        "stability",
        "min_ret",
        "max_ret",
    )


# --------------------------------------------------------------------------
# Nested-shape bundle: the tweets array<struct> round trip (OP-05/68) + the
# implied struct/JSON flatten (OP-21) on the exploded rows. Single-operator
# forms: local tier.
# --------------------------------------------------------------------------
@register(
    "nested_flatten_explode",
    oracle="""
    SELECT user_id AS symbol, ts, event_type AS content,
           value AS c, round(value * 1.01, 6) AS h, round(value * 0.99, 6) AS l,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events WHERE event_type IN ('click', 'view')
    """,
)
def nested_flatten_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """twitter/main.py:18-27 + finnhub/main.py:19-23 — pack each symbol's
    events into a sorted array of structs (the stored tweets shape), explode
    back to rows, rebuild the nested quote struct + JSON payload, and
    flatten with select('data.*'). The oracle is the flat projection — the
    whole nested round trip must be lossless, and Catalyst collapses the
    construct+flatten pair to a no-op."""
    ev = _events(spark, sf_dir).filter(F.col("event_type").isin("click", "view"))
    packed = ev.groupBy(F.col("user_id").alias("symbol")).agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value", "props"))
        ).alias("tweets")
    )
    t = packed.select("symbol", F.explode("tweets").alias("t"))
    nested = t.select(
        "symbol",
        F.col("t.ts").alias("ts"),
        F.col("t.event_type").alias("content"),
        F.struct(
            F.col("t.value").alias("c"),
            F.round(F.col("t.value") * 1.01, 6).alias("h"),
            F.round(F.col("t.value") * 0.99, 6).alias("l"),
        ).alias("data"),
        F.from_json(F.col("t.props"), "k INT").alias("doc"),
    )
    return nested.select("symbol", "ts", "content", "data.*", F.col("doc.k").alias("k"))


# --------------------------------------------------------------------------
# Reshape bundle: the trends melt IS a union-all of per-column projections
# (integrate/main.py:82-87 melts by project+concat) — so one query exercises
# melt (OP-47) and unionByName (OP-48) with deliberately misordered branch
# columns. Single-operator forms: local tier.
# --------------------------------------------------------------------------
@register(
    "melt_union_trends",
    oracle="""
    WITH wide AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'click') AS click,
             last(value ORDER BY ts, event_id) FILTER (WHERE event_type = 'purchase') AS purchase
      FROM events GROUP BY 1
    )
    SELECT hour_ts, 'click' AS series, click AS trend_score FROM wide
      WHERE click IS NOT NULL
    UNION ALL
    SELECT hour_ts, 'purchase' AS series, purchase AS trend_score FROM wide
      WHERE purchase IS NOT NULL
    """,
)
def melt_union_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """integrate/main.py:82-87 — wide trend columns → long rows exactly the
    way the reference does it: per-column project + concat, i.e. a
    unionByName whose branches list columns in different orders (name
    alignment, not positional)."""
    ev = _events(spark, sf_dir).withColumn("hour_ts", hour_floor("ts"))
    wide = pivot_last(
        ev.select("hour_ts", "event_type", "value", "ts", "event_id"),
        ts_col="hour_ts",
        key_col="event_type",
        val_col="value",
        keys=["click", "purchase"],
        order_col="struct(ts, event_id)",
    )
    a = wide.select(
        "hour_ts", F.lit("click").alias("series"), F.col("click").alias("trend_score")
    )
    b = wide.select(
        F.col("purchase").alias("trend_score"),
        F.lit("purchase").alias("series"),
        "hour_ts",
    )
    return a.unionByName(b).filter(F.col("trend_score").isNotNull())


# --- Sessionization (gaps-and-islands) ---------------------------------------
@register_local(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value
    FROM numbered GROUP BY 1, 2
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) — the classic
    large-scale clickstream operator the reference's hourly grid implies but
    never names. One shuffle on user_id serves both windows (same
    partitioning); the session rollup groups by (user_id, session_no) on
    already-co-located rows. Gap arithmetic in integer microseconds — exact
    and identical to DuckDB's INTERVAL comparison.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("session_value"),
    )


# --- OP-62 family: native session windows ------------------------------------
@register_local(
    "session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``session_window`` (the streaming-capable session
    operator — the same expression works under ``readStream`` with a
    watermark). Semantics verified against gaps-and-islands: events merge
    while gap ≤ 30 min, window end = last event + gap. The oracle derives
    the identical sessions relationally."""
    ev = _events(spark, sf_dir)
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# OP-63 scale path: incremental MERGE/upsert instead of full recompute.
# Snapshot = events before the cutoff; delta = events after it, where
# low-value records are tombstones. One window over the union — O(delta),
# not O(history) (operators/merge.py).
# --------------------------------------------------------------------------
@register_local(
    "merge_upsert_snapshot",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_type, ts, value, event_id,
             CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00' THEN 1 ELSE 0 END AS src,
             (ts >= TIMESTAMP '2024-01-20 00:00:00' AND value < 1.0) AS del
      FROM events
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, src DESC, event_id DESC) AS rn
      FROM tagged
    )
    SELECT user_id, event_type, ts, value, event_id
    FROM ranked WHERE rn = 1 AND NOT del
    """,
)
def merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a tombstone-carrying delta into the snapshot, latest version
    per (user_id, event_type) wins, update beats snapshot on timestamp
    ties, tombstoned keys drop out. The whole fold is one shuffle on the
    merge key — at 100 TB it is sized by the delta plus touched snapshot
    partitions, never by history (the reference recomputes history each
    run: preprocess_function/main.py:14-39)."""
    from ..operators.merge import merge_upsert

    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    base = ev.filter(F.col("ts") < cutoff).withColumn("_tomb", F.lit(False))
    updates = ev.filter(F.col("ts") >= cutoff).withColumn(
        "_tomb", F.col("value") < 1.0
    )
    merged = merge_upsert(
        base.select("user_id", "event_type", "ts", "value", "event_id", "_tomb"),
        updates,
        keys=["user_id", "event_type"],
        ts_col="ts",
        delete_col="_tomb",
        tiebreak=["event_id"],
    )
    return merged.select("user_id", "event_type", "ts", "value", "event_id")


# --------------------------------------------------------------------------
# Interval (range) join: purchases ⋈ same-user clicks in the preceding hour
# — the batch twin of streaming/ingest.py::interval_join_streams, and the
# range-join family the as-of join (OP-26) generalizes.
# --------------------------------------------------------------------------
@register_local(
    "interval_join_purchase_click",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           date_diff('microsecond', c.ts, p.ts) AS gap_micros
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def interval_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on user_id with the interval as a post-join range filter:
    one shuffle per side on the join key, never a time-cross-join. At 100 TB
    both sides are additionally partition-pruned to overlapping time ranges
    before the join; streaming twin (state-bounded) in streaming/ingest.py."""
    ev = load_events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_id",
            "click_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_micros"),
        )
    )


# --------------------------------------------------------------------------
# OP-61..OP-63 under the driver: batch ≡ streaming as a checkable query.
# --------------------------------------------------------------------------
@register(
    "streaming_batch_parity",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS hour_ts, user_id AS symbol,
             last(value ORDER BY ts, event_id) AS price,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT hour_ts, symbol, price, n_events
    FROM agg, mx
    WHERE hour_ts + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
    """,
)
def streaming_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-61/62/63 proven under the driver, not just pytest: the events
    fixture replayed through the REAL Structured Streaming path (file
    source → watermark → tumbling hourly max_by aggregate → append-mode
    memory sink, AvailableNow trigger), returned as the final table. The
    oracle is the batch tumbling SQL restricted to closed windows — append
    mode only emits a window once the 2 h watermark passes its end, so
    emitted ≡ {windows with end ≤ max(ts) − 2 h}, and a hash match proves
    the incremental execution (state store, watermark bookkeeping,
    late-data semantics) agrees with the batch plan row for row."""
    import os as _os
    import shutil
    import tempfile
    import uuid

    from ..streaming.ingest import (
        hourly_tumbling_agg,
        read_events_stream,
        run_to_memory,
    )

    name = f"stream_parity_{uuid.uuid4().hex[:8]}"
    td = tempfile.mkdtemp(prefix="stream_parity_")
    try:
        shutil.copy(
            _os.path.join(sf_dir, "events.parquet"),
            _os.path.join(td, "part-000.parquet"),
        )
        # memory sink materializes on the driver at run time, so the temp
        # source dir can be deleted as soon as the stream terminates
        run_to_memory(hourly_tumbling_agg(read_events_stream(spark, td)), name)
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return spark.table(name)


@register(
    "streaming_stateful_ffill_parity",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS tmin,
             date_trunc('hour', max(ts)) AS tmax
      FROM events
    ), grid AS (
      SELECT unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR)) AS ts
      FROM bounds
    ), inds AS (
      SELECT DISTINCT event_type AS indicator FROM events
    ), hourly AS (
      SELECT event_type AS indicator, date_trunc('hour', ts) AS ts,
             last(value ORDER BY ts, event_id) AS value
      FROM events GROUP BY 1, 2
    ), cells AS (
      SELECT i.indicator, g.ts, h.value
      FROM inds i CROSS JOIN grid g
      LEFT JOIN hourly h ON h.indicator = i.indicator AND h.ts = g.ts
    )
    SELECT indicator, ts,
           LAST_VALUE(value IGNORE NULLS) OVER (
             PARTITION BY indicator ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           value IS NULL AS filled
    FROM cells
    """,
)
def streaming_stateful_ffill_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-64 proven under the driver, not just pytest: the FRED-style
    carry-forward (integrate/main.py:72 ``resample('1H').ffill()``) run
    through the REAL incremental path — ``applyInPandasWithState`` keeping
    one float of state per indicator — and hash-matched against the batch
    unbounded-preceding window the oracle computes.

    Harness: the gappy hourly macro grid (indicator × global hour grid,
    NULL where no observation) is built in batch, written as THREE
    time-ordered parquet chunks with strictly increasing mtimes, and
    replayed with ``maxFilesPerTrigger=1`` — so the stream executes three
    micro-batches and every fill that crosses a chunk boundary must come
    out of the state store, not the in-batch sort. A hash match therefore
    proves cross-batch state carry, not just per-batch ffill. (The chunk
    write is harness scaffolding, same as `streaming_batch_parity`'s file
    copy — the measured operator is the stream.) The chunks are written
    Spark-side with ``repartitionByRange(3, ts, indicator)`` — a global
    range split, so every chunk is a contiguous time slice (per indicator
    too) and nothing is materialized on the driver however long the
    replayed range grows."""
    import os as _os
    import shutil
    import tempfile
    import time as _time
    import uuid

    from ..streaming.ingest import run_to_memory
    from ..streaming.stateful import stateful_ffill

    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.col("event_type").alias("indicator"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.expr("max_by(value, struct(ts, event_id))").alias("value"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("tmin"),
        F.date_trunc("hour", F.max("ts")).alias("tmax"),
    )
    grid = bounds.select(
        F.explode(F.sequence("tmin", "tmax", F.expr("interval 1 hour"))).alias("hour")
    )
    inds = ev.select(F.col("event_type").alias("indicator")).distinct()
    cells = (
        inds.crossJoin(grid)
        .join(hourly, ["indicator", "hour"], "left")
        .select("indicator", F.col("hour").alias("ts"), F.col("value").cast("double"))
    )

    name = f"stateful_ffill_{uuid.uuid4().hex[:8]}"
    td = tempfile.mkdtemp(prefix="stateful_ffill_")
    try:
        # Range-partitioned distributed write: part-00000..2 hold ascending
        # (ts, indicator) ranges (Spark writes timestamps as µs-compatible
        # physical types, so the stream reader accepts them directly).
        cells.repartitionByRange(3, "ts", "indicator").write.mode(
            "overwrite"
        ).parquet(td)
        parts = sorted(p for p in _os.listdir(td) if p.endswith(".parquet"))
        now = _time.time()
        for k, fname in enumerate(parts):
            # strictly increasing mtimes in range order: the file source
            # processes oldest first, pinning micro-batch order to time order
            path = _os.path.join(td, fname)
            _os.utime(path, (now - 20 + 10 * k, now - 20 + 10 * k))
        stream = (
            spark.readStream.schema("indicator string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(td)
        )
        run_to_memory(stateful_ffill(stream), name)
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return spark.table(name)


# --------------------------------------------------------------------------
# Hourly OHLC bars — the canonical market resample implied by the OHLCV
# source (OP-02): open/close are positional firsts/lasts in the bar,
# high/low plain extrema. All four are *selected* values (no arithmetic),
# so the bars are bit-exact on any engine or partitioning.
# --------------------------------------------------------------------------
@register_local(
    "hourly_ohlc_bars",
    oracle="""
    SELECT user_id AS symbol,
           date_trunc('hour', ts) AS hour_ts,
           first(value ORDER BY ts, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           count(*) AS n_ticks
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash aggregate with map-side combine: min_by/max_by over the
    (ts, event_id) total order give open/close without any window or sort,
    so the whole bar build is a single shuffle keyed (symbol, hour) — the
    same plan at 100 TB, with partial bars merged associatively."""
    ev = load_events(spark, sf_dir)
    order_key = F.struct("ts", "event_id")
    return (
        ev.groupBy(
            F.col("user_id").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour_ts"),
        )
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


# --------------------------------------------------------------------------
# OP-07/OP-08 file-connector round-trips, oracle-checked (reference path:
# integrate/main.py:9-14 GCS CSV coupling; the JSONL twin is the
# training-corpus interchange edge). Each query computes a frame, writes it
# through the connector, reads it back and returns the read-back frame —
# the DuckDB oracle computes the same frame directly from parquet, so the
# hash match proves the sink+source preserve values, types, NULLs,
# quoting, and µs-timestamp precision end-to-end. Local tier: the
# connectors are edge I/O, not driver-slot-worthy query shapes.
# --------------------------------------------------------------------------
def _roundtrip_dir(kind: str, sf_dir: str) -> str:
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"sg_roundtrip_{kind}_{tag}")


_ROUNDTRIP_ORACLE = """
    SELECT event_id, user_id AS symbol, ts,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n,
           event_type, NULLIF(props, '{"k": 0}') AS props_n
    FROM events
"""


def _roundtrip_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.col("user_id").alias("symbol"),
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_n"),
        "event_type",
        F.nullif(F.col("props"), F.lit('{"k": 0}')).alias("props_n"),
    )


@register_local("csv_roundtrip_parity", oracle=_ROUNDTRIP_ORACLE)
def csv_roundtrip_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write_csv → read_csv round-trip on an events projection with NULLs
    (double + string), JSON-ish quoted strings, and µs timestamps
    (timestampFormat pinned to SSSSSS — Spark's CSV default silently
    truncates to milliseconds)."""
    from ..sources.tables import read_csv, write_csv

    df = _roundtrip_frame(spark, sf_dir)
    path = _roundtrip_dir("csv", sf_dir)
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    write_csv(df, path, timestampFormat=ts_fmt)
    return read_csv(spark, path, schema=df.schema, timestampFormat=ts_fmt)


@register_local("jsonl_roundtrip_parity", oracle=_ROUNDTRIP_ORACLE)
def jsonl_roundtrip_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write_jsonl → read_jsonl round-trip of the same frame (gzip parts;
    timestampFormat pinned to SSSSSS on both sides — like CSV, Spark's
    JSON default keeps milliseconds only). Dropped-key semantics: a NULL column is omitted
    from the JSON line and must come back NULL under the explicit schema."""
    from ..sources.tables import read_jsonl, write_jsonl

    df = _roundtrip_frame(spark, sf_dir)
    path = _roundtrip_dir("jsonl", sf_dir)
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    write_jsonl(df, path, timestampFormat=ts_fmt)
    return read_jsonl(spark, path, schema=df.schema, timestampFormat=ts_fmt)


# --- custom Python DataSource ingestion (r5) ---------------------------------------
# The reference's scheduler-driven API pollers (finnhub/yahoo/fred/...)
# as a REAL Spark integration mechanism: a pyspark.sql.datasource custom
# source (Spark 4 Python DataSource API), batch + streaming, with a
# deterministic generator standing in for the network so even the
# ingestion adapter is DuckDB-hash-checked. See sources/feed.py.
from ..sources.feed import feed_oracle_sql as _feed_oracle_sql

_FEED_N = 500


def _feed_agg(df: DataFrame) -> DataFrame:
    from ..functions.scalar import exact_sum

    return df.groupBy("symbol", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value", "sum_value"),
        F.max("ts").alias("last_ts"),
    )


@register_local(  # demoted r12 (slot for the promotion cohort): the
    # custom Python DataSource surface keeps its driver hash row via
    # streaming_pysource_ticks_parity (same source, streaming variant)
    "pysource_quote_feed",
    oracle=f"""
    WITH feed AS ({_feed_oracle_sql(_FEED_N)})
    SELECT symbol, event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           max(ts) AS last_ts
    FROM feed GROUP BY symbol, event_type
    """,
)
def pysource_quote_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read through the custom `quote_feed` Python DataSource
    (partition-parallel generation — at scale, partition-parallel HTTP
    fetch) → per-(symbol, type) decimal-exact rollup. The oracle
    recomputes the md5-derived feed in SQL, so the WHOLE path — custom
    source included — is hash-checked."""
    from ..sources.feed import register_feed

    register_feed(spark)
    df = (
        spark.read.format("quote_feed")
        .option("n", str(_FEED_N))
        .load()
    )
    return _feed_agg(df)


# driver tier since r11 (the last standing-queue member): the streaming
# half of the custom Python DataSource surface gains its own driver hash
# row beside the batch pysource_quote_feed
@register(
    "streaming_pysource_ticks_parity",
    oracle=_feed_oracle_sql(_FEED_N),
)
def streaming_pysource_ticks_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's cron-poller ingest (README.md:23) end to end on
    the custom streaming source: three scheduler ticks, each a
    `Trigger.AvailableNow` run against the SAME checkpoint while the
    feed's available data grows (n = 100 → 300 → 500) — every tick
    ingests exactly the rows that arrived since the last committed
    offset (Spark hands the committed index to `partitions(start, end)`),
    so the parquet sink ends with each row exactly once. The oracle is
    the full 500-row feed: rows+hash equality proves offset-tracked
    exactly-once ingestion across restarts, not just within one run."""
    import shutil
    import tempfile

    from ..sources.feed import register_feed

    register_feed(spark)
    td = tempfile.mkdtemp(prefix="feed_ticks_")
    out, ckpt = f"{td}/out", f"{td}/ckpt"
    try:
        for n in (100, 300, _FEED_N):
            stream = (
                spark.readStream.format("quote_feed")
                .option("n", str(n))
                .load()
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.read.parquet(out).localCheckpoint()
    finally:
        shutil.rmtree(td, ignore_errors=True)


@register_local(
    "manifest_export_roundtrip",
    oracle="""
    SELECT bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT)) AS fingerprint,
           count(*) AS n_rows
    FROM documents
    """,
)
def manifest_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export through the custom `manifest_shards` Python
    DataSource WRITER (sources/manifest_sink.py): every task writes one
    parquet shard and reports (file, rows, xor-fingerprint) in its
    commit message; the driver's commit writes `_MANIFEST.json` listing
    exactly the committed shards — Spark's v2 two-phase commit protocol,
    made explicit. This query exports the documents table, re-reads the
    shards, and returns the dataset fingerprint + row count computed
    FROM THE READBACK; the oracle recomputes both from the original
    table, so write-path fidelity is hash-checked, and the function
    additionally asserts the manifest's own totals equal the readback
    (a shard the manifest lists but the tasks didn't write — or vice
    versa — fails loudly). The XOR-of-md5 fingerprint is order- and
    shard-independent, so the check is layout-invariant by
    construction."""
    import tempfile

    from ..sources.manifest_sink import (
        read_manifest,
        read_via_manifest,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    # kept for the session, like the compaction query: the dir IS the
    # exported artifact, and keeping it keeps the returned plan real
    td = tempfile.mkdtemp(prefix="manifest_export_")
    (
        d.repartition(8, "doc_id")
        .write.format("manifest_shards")
        .option("path", td)
        .option("keyColumn", "doc_id")
        .mode("append")
        .save()
    )
    m = read_manifest(td)
    back = read_via_manifest(spark, td)
    out = back.agg(
        F.expr(
            "bit_xor(cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
            " 16, 10) as bigint))"
        ).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    got = out.collect()[0]
    if (got.n_rows, got.fingerprint) != (m["n_rows"], m["fingerprint"]):
        raise AssertionError(
            f"manifest integrity violated: manifest says "
            f"({m['n_rows']}, {m['fingerprint']}), shards contain "
            f"({got.n_rows}, {got.fingerprint})"
        )
    return out


@register_local(
    "streaming_manifest_export_parity",
    oracle=_feed_oracle_sql(_FEED_N),
)
def streaming_manifest_export_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full custom-DataSource pipeline: the quote-feed STREAM source
    feeding the manifest-committing STREAM sink across three scheduler
    ticks (AvailableNow runs against one checkpoint while the feed
    grows). Every micro-batch's shards are appended to the manifest
    atomically in the epoch commit — a replayed batch's shards are
    recognized and never double-listed — and the returned rows come
    through `read_via_manifest`, so the oracle hash-match proves
    end-to-end exactly-once: source offsets, epoch commits, and the
    manifest's accounting all agree with the 500-row feed definition."""
    import shutil
    import tempfile

    from ..sources.feed import register_feed
    from ..sources.manifest_sink import (
        read_manifest,
        read_via_manifest,
        register_manifest_sink,
    )

    register_feed(spark)
    register_manifest_sink(spark)
    td = tempfile.mkdtemp(prefix="stream_manifest_")
    out, ckpt = f"{td}/out", f"{td}/ckpt"
    try:
        for n in (100, 300, _FEED_N):
            stream = (
                spark.readStream.format("quote_feed")
                .option("n", str(n))
                .load()
            )
            q = (
                stream.writeStream.format("manifest_shards")
                .option("path", out)
                .option("keyColumn", "event_id")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        m = read_manifest(out)
        back = read_via_manifest(spark, out)
        if back.count() != m["n_rows"]:
            raise AssertionError(
                f"manifest says {m['n_rows']} rows, shards hold "
                f"{back.count()}"
            )
        return back.localCheckpoint()
    finally:
        shutil.rmtree(td, ignore_errors=True)


# --------------------------------------------------------------------------
# Technical-indicators bundle — the stock-analytics window-function tier
# (SMA, Bollinger bands, rate-of-change, Cutler's RSI) over the hourly
# close series.  The reference computes per-symbol rolling statistics in
# pandas (dashboard/app.py's chart inputs, analysis_part/main.py's lag
# features); this is the same family expressed as ONE windowed plan.
#
# Hash-certification contract: prices are quantized to millipoints
# (round(value * 1000) as BIGINT — the same fixed-point trick as the
# covariance operator), so every rolling sum is integer-exact and
# association-order independent; means/variances/RSI then derive from
# those integers via identical IEEE double expressions on both engines
# (sqrt is correctly-rounded per IEEE-754, so it is bit-stable too).
# Overflow bound: sum of 20 squared millipoint prices < 2^63 requires
# |price| < 6.7e5 — documented, far above any fixture or realistic quote.
# --------------------------------------------------------------------------
_TI_VAR20 = (
    "(CAST(q20 AS DOUBLE)/1000000.0 "
    "- (CAST(s20 AS DOUBLE)/1000.0)*(CAST(s20 AS DOUBLE)/1000.0)/20.0)/19.0"
)

_TI_ORACLE = f"""
    WITH bars AS (
      SELECT user_id AS symbol, date_trunc('hour', ts) AS hour_ts,
             last(value ORDER BY ts, event_id) AS close,
             CAST(round(last(value ORDER BY ts, event_id) * 1000) AS BIGINT)
               AS close_fp
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT symbol, hour_ts, close, close_fp,
             row_number() OVER sym AS rn,
             sum(close_fp) OVER
               (sym ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s5,
             sum(close_fp) OVER
               (sym ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS s20,
             sum(close_fp * close_fp) OVER
               (sym ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS q20,
             lag(close_fp, 12) OVER sym AS lag12,
             close_fp - lag(close_fp) OVER sym AS d1
      FROM bars
      WINDOW sym AS (PARTITION BY symbol ORDER BY hour_ts)
    ), g AS (
      SELECT symbol, hour_ts, close, close_fp, rn, s5, s20, q20, lag12,
             sum(CASE WHEN d1 > 0 THEN d1 ELSE 0 END) OVER
               (sym ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS gains,
             sum(CASE WHEN d1 < 0 THEN -d1 ELSE 0 END) OVER
               (sym ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS losses
      FROM w
      WINDOW sym AS (PARTITION BY symbol ORDER BY hour_ts)
    )
    SELECT symbol, hour_ts, close,
           CASE WHEN rn >= 5 THEN CAST(s5 AS DOUBLE)/5000.0 END AS sma5,
           CASE WHEN rn >= 20 THEN CAST(s20 AS DOUBLE)/20000.0 END AS sma20,
           CASE WHEN rn >= 20 THEN CAST(s20 AS DOUBLE)/20000.0
                + 2.0 * sqrt(greatest({_TI_VAR20}, 0.0)) END AS boll_upper,
           CASE WHEN rn >= 20 THEN CAST(s20 AS DOUBLE)/20000.0
                - 2.0 * sqrt(greatest({_TI_VAR20}, 0.0)) END AS boll_lower,
           CASE WHEN rn >= 13 AND lag12 <> 0
                THEN CAST(close_fp - lag12 AS DOUBLE) / CAST(lag12 AS DOUBLE)
           END AS roc12,
           CASE WHEN rn >= 15 THEN
             CASE WHEN losses = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + CAST(gains AS DOUBLE)
                                              / CAST(losses AS DOUBLE))
             END
           END AS rsi14
    FROM g
    """


def _indicator_bars(ev: DataFrame) -> DataFrame:
    """(symbol, hour_ts, close, close_fp) hourly bars — ONE hash aggregate
    with map-side combine; close is the positional last under the
    (ts, event_id) total order."""
    order_key = F.struct("ts", "event_id")
    return (
        ev.groupBy(
            F.col("user_id").alias("symbol"),
            F.date_trunc("hour", "ts").alias("hour_ts"),
        )
        .agg(F.max_by("value", order_key).alias("close"))
        .withColumn("close_fp", F.round(F.col("close") * 1000, 0).cast("long"))
    )


def _indicators_from_bars(bars: DataFrame) -> DataFrame:
    """The windowed indicator pass, shared verbatim by the batch query and
    the streaming parity so both tiers score through one definition."""
    sym = Window.partitionBy("symbol").orderBy("hour_ts")
    r5 = sym.rowsBetween(-4, 0)
    r20 = sym.rowsBetween(-19, 0)
    r14 = sym.rowsBetween(-13, 0)
    w = bars.select(
        "symbol",
        "hour_ts",
        "close",
        "close_fp",
        F.row_number().over(sym).alias("rn"),
        F.sum("close_fp").over(r5).alias("s5"),
        F.sum("close_fp").over(r20).alias("s20"),
        F.sum(F.col("close_fp") * F.col("close_fp")).over(r20).alias("q20"),
        F.lag("close_fp", 12).over(sym).alias("lag12"),
        (F.col("close_fp") - F.lag("close_fp", 1).over(sym)).alias("d1"),
    )
    g = w.select(
        "symbol",
        "hour_ts",
        "close",
        "close_fp",
        "rn",
        "s5",
        "s20",
        "q20",
        "lag12",
        F.sum(F.when(F.col("d1") > 0, F.col("d1")).otherwise(F.lit(0)))
        .over(r14)
        .alias("gains"),
        F.sum(F.when(F.col("d1") < 0, -F.col("d1")).otherwise(F.lit(0)))
        .over(r14)
        .alias("losses"),
    )
    var20 = F.expr(_TI_VAR20)
    mean20 = F.expr("CAST(s20 AS DOUBLE)/20000.0")
    band = 2.0 * F.sqrt(F.greatest(var20, F.lit(0.0)))
    return g.select(
        "symbol",
        "hour_ts",
        "close",
        F.when(F.col("rn") >= 5, F.expr("CAST(s5 AS DOUBLE)/5000.0")).alias(
            "sma5"
        ),
        F.when(F.col("rn") >= 20, mean20).alias("sma20"),
        F.when(F.col("rn") >= 20, mean20 + band).alias("boll_upper"),
        F.when(F.col("rn") >= 20, mean20 - band).alias("boll_lower"),
        F.when(
            (F.col("rn") >= 13) & (F.col("lag12") != 0),
            F.expr(
                "CAST(close_fp - lag12 AS DOUBLE) / CAST(lag12 AS DOUBLE)"
            ),
        ).alias("roc12"),
        F.when(
            F.col("rn") >= 15,
            F.when(F.col("losses") == 0, F.lit(100.0)).otherwise(
                F.lit(100.0)
                - F.lit(100.0)
                / (
                    F.lit(1.0)
                    + F.expr("CAST(gains AS DOUBLE) / CAST(losses AS DOUBLE)")
                )
            ),
        ).alias("rsi14"),
    )


@register_local("technical_indicators_bundle", oracle=_TI_ORACLE)
def technical_indicators_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMA-5/20, Bollinger(20, 2σ), ROC-12, and Cutler's RSI-14 as one
    plan: the bar build is a single (symbol, hour) hash aggregate; every
    indicator then rides ONE exchange keyed by symbol — all window frames
    share the identical (PARTITION BY symbol ORDER BY hour_ts) spec, so
    Spark evaluates them in a single Window operator pass per frame width,
    with no extra shuffles.  At 100 TB the plan is unchanged: one
    aggregate exchange + one window exchange; within-partition frames
    never spill cross-key."""
    return _indicators_from_bars(_indicator_bars(load_events(spark, sf_dir)))


@register_local("streaming_indicators_parity", oracle=_TI_ORACLE)
def streaming_indicators_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The indicator bundle on the LIVE tick path — the twelfth streaming
    parity: hourly bars are maintained incrementally (each micro-batch
    appends delta-sized bar PARTIALS: its per-(symbol, hour) last-tick
    candidate carrying the (ts, event_id) order key), the at-rest bar
    table merges partials by max_by over the stored order key — exact
    under any batch split, because positional-last is a selection, not
    arithmetic — and the indicators then score from the maintained bars
    through the SAME `_indicators_from_bars` the batch query uses (one
    windowed definition by construction).  The events replay is range-
    split by event_id into three micro-batches, so almost every bar
    spans batches and a hash match proves the cross-batch MERGE law, not
    just per-batch aggregation.  Per-tick work is delta-sized; the bar
    state is bars-sized (hours × symbols), never ticks-sized."""
    import shutil
    import tempfile

    from ..streaming.ingest import read_events_stream

    td = tempfile.mkdtemp(prefix="stream_ti_")
    src_dir = f"{td}/src"
    bars_dir = f"{td}/state_bars"
    try:
        load_events(spark, sf_dir).repartitionByRange(3, "event_id").write.mode(
            "overwrite"
        ).parquet(src_dir)

        def per_batch(batch_df: DataFrame, batch_id: int) -> None:
            order_key = F.struct("ts", "event_id")
            (
                batch_df.groupBy(
                    F.col("user_id").alias("symbol"),
                    F.date_trunc("hour", "ts").alias("hour_ts"),
                )
                .agg(
                    F.max_by("value", order_key).alias("close"),
                    F.max(order_key).alias("okey"),
                )
                .write.mode("append")
                .parquet(bars_dir)
            )

        q = (
            read_events_stream(spark, src_dir, max_files_per_trigger=1)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{td}/_ckpt")
            .start()
        )
        q.awaitTermination()
        merged = (
            spark.read.parquet(bars_dir)
            .groupBy("symbol", "hour_ts")
            .agg(F.max_by("close", "okey").alias("close"))
            .withColumn(
                "close_fp", F.round(F.col("close") * 1000, 0).cast("long")
            )
        )
        # localCheckpoint: the result must outlive the temp dirs
        return _indicators_from_bars(merged).localCheckpoint()
    finally:
        shutil.rmtree(td, ignore_errors=True)


# --------------------------------------------------------------------------
# Additive seasonal decomposition — value = level + seasonal(hour-of-day)
# + residual, the classical-decomposition profile a market monitor hangs
# intraday anomaly flags on.  Exact arithmetic throughout: all three
# moments are decimal-sum means (order-independent), and the residual
# variance quantizes each squared deviation to the same decimal(38,6)
# grid on both engines (the exact_sum contract).
# --------------------------------------------------------------------------
@register_local(
    "seasonal_decompose_additive",
    oracle=f"""
    WITH lv AS (
      SELECT user_id AS symbol, {oracle_exact_avg('value')} AS level
      FROM events GROUP BY 1
    ), seas AS (
      SELECT user_id AS symbol, hour(ts) AS hod,
             {oracle_exact_avg('value')} AS hod_mean,
             count(*) AS n_obs
      FROM events GROUP BY 1, 2
    ), resid AS (
      SELECT e.user_id AS symbol, hour(e.ts) AS hod,
             {oracle_exact_avg('(e.value - s.hod_mean) * (e.value - s.hod_mean)')}
               AS resid_var
      FROM events e
      JOIN seas s ON s.symbol = e.user_id AND s.hod = hour(e.ts)
      GROUP BY 1, 2
    )
    SELECT s.symbol, s.hod, lv.level,
           s.hod_mean - lv.level AS seasonal,
           s.n_obs, r.resid_var
    FROM seas s
    JOIN lv ON lv.symbol = s.symbol
    JOIN resid r ON r.symbol = s.symbol AND r.hod = s.hod
    """,
)
def seasonal_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregates + one self-join: the (symbol, hod) profile and the
    per-symbol level are both map-side-combined rollups; the residual
    variance re-joins the profile onto the events ONCE (keyed the same
    (symbol, hod) as the profile aggregate, so at 100 TB the exchange is
    reused).  The profile side is symbols × 24 rows — the symbol
    dimension grows with data, so it stays UNHINTED and AQE size-gates
    the join: broadcast at test SFs, shuffle join (on the already-reused
    key) past the threshold."""
    ev = load_events(spark, sf_dir)
    lv = ev.groupBy(F.col("user_id").alias("symbol")).agg(
        exact_avg("value", "level")
    )
    seas = ev.groupBy(
        F.col("user_id").alias("symbol"), F.hour("ts").alias("hod")
    ).agg(
        exact_avg("value", "hod_mean"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    dev = (
        ev.select(
            F.col("user_id").alias("symbol"),
            F.hour("ts").alias("hod"),
            "value",
        )
        .join(seas.select("symbol", "hod", "hod_mean"), ["symbol", "hod"])
        .withColumn("_d", F.col("value") - F.col("hod_mean"))
    )
    resid = dev.groupBy("symbol", "hod").agg(
        exact_avg(F.col("_d") * F.col("_d"), "resid_var")
    )
    return (
        seas.join(lv, "symbol")
        .join(resid, ["symbol", "hod"])
        .select(
            "symbol",
            "hod",
            "level",
            (F.col("hod_mean") - F.col("level")).alias("seasonal"),
            "n_obs",
            "resid_var",
        )
    )


@register_local("orc_roundtrip_parity", oracle=_ROUNDTRIP_ORACLE)
def orc_roundtrip_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write → read round-trip through ORC — the third columnar-adjacent
    interchange format after parquet and CSV/JSONL.  ORC timestamps carry
    nanosecond precision natively, so unlike the text formats no
    timestampFormat pinning is needed; the hash match proves values,
    types, NULLs, and µs timestamps survive the ORC writer/reader pair
    end-to-end (Spark's vectorized ORC reader applies the same pushdown
    machinery as parquet at scale)."""
    df = _roundtrip_frame(spark, sf_dir)
    path = _roundtrip_dir("orc", sf_dir)
    df.write.mode("overwrite").format("orc").save(path)
    return spark.read.schema(df.schema).format("orc").load(path)


# --------------------------------------------------------------------------
# Hopping (sliding) windows — the third time-window type beside the
# tumbling (streaming_batch_parity) and session (session_window_native)
# aggregations: 2-hour windows sliding every hour, so each tick lands in
# exactly two overlapping windows. The oracle is shared with the r11
# streaming parity below, which serves the same windows from
# incrementally maintained hour state.
# --------------------------------------------------------------------------
_HOPPING_SQL = f"""
    WITH x AS (
      SELECT user_id AS symbol, ts, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start
      FROM events
    )
    SELECT symbol, win_start,
           win_start + INTERVAL 2 HOUR AS win_end,
           count(*) AS n_ticks,
           {oracle_exact_avg('value')} AS avg_value
    FROM x
    GROUP BY symbol, win_start
    """


@register_local(
    "hopping_window_volume",
    oracle=_HOPPING_SQL,
)
def hopping_window_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`F.window(ts, '2 hours', '1 hour')` — Spark expands each row into
    its two overlapping window assignments (an Expand node, same shape as
    grouping sets) and aggregates once; the oracle states the identical
    expansion explicitly via unnest.  At 100 TB the fan-out factor is
    length/slide = 2 regardless of scale, and the aggregate stays one
    keyed exchange with map-side combine."""
    ev = load_events(spark, sf_dir)
    w = F.window("ts", "2 hours", "1 hour")
    return (
        ev.groupBy(F.col("user_id").alias("symbol"), w.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            exact_avg("value", "avg_value"),
        )
        .select(
            "symbol",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_ticks",
            "avg_value",
        )
    )


@register_local("streaming_hopping_volume_parity", oracle=_HOPPING_SQL)
def streaming_hopping_volume_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hopping windows on the LIVE tick path — the seventeenth streaming
    parity: each micro-batch appends delta-sized per-(symbol, hour)
    decimal partials (the streaming_time_rollup_parity state shape,
    batch_id-keyed overwrite so a retried foreachBatch replaces its own
    partials — exactly-once effect over at-least-once execution), and
    the 2h/1h hopping windows are SERVED from the maintained hour state:
    each hour bucket expands into its two covering window starts and the
    partials re-aggregate — no tick rescan, state is buckets-sized. The
    decimal sums reassociate losslessly and the average divides the
    merged decimal total once in double, so the served windows
    hash-match the batch `hopping_window_volume` oracle over raw events
    under any batch split (three range-split micro-batches, so most
    windows span batches and the match proves the cross-batch merge
    law)."""
    import shutil
    import tempfile

    from ..streaming.ingest import read_events_stream

    td = tempfile.mkdtemp(prefix="stream_hopping_")
    src_dir = f"{td}/src"
    hours_dir = f"{td}/state_hours"
    try:
        load_events(spark, sf_dir).repartitionByRange(3, "event_id").write.mode(
            "overwrite"
        ).parquet(src_dir)

        def per_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.groupBy(
                    F.col("user_id").alias("symbol"),
                    F.date_trunc("hour", "ts").alias("hour_ts"),
                )
                .agg(
                    F.sum(F.col("value").cast("decimal(38,6)")).alias(
                        "sum_dec"
                    ),
                    F.count(F.lit(1)).alias("n_ticks"),
                    # non-null value count, tracked separately so the
                    # served average divides by count(value) like
                    # exact_avg / the oracle — not count(*) — and the
                    # parity holds even if the feed carries null values
                    F.count("value").alias("n_vals"),
                )
                .write.mode("overwrite")
                .parquet(f"{hours_dir}/batch_id={batch_id}")
            )

        q = (
            read_events_stream(spark, src_dir, max_files_per_trigger=1)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{td}/_ckpt")
            .start()
        )
        q.awaitTermination()
        hours = (
            spark.read.parquet(hours_dir)
            .groupBy("symbol", "hour_ts")
            .agg(
                F.sum("sum_dec").alias("sum_dec"),
                F.sum("n_ticks").alias("n_ticks"),
                F.sum("n_vals").alias("n_vals"),
            )
        )
        # each maintained hour bucket feeds exactly two hopping windows
        # (length/slide = 2) — the same Expand shape the batch query
        # plans over raw ticks, here over the tiny hour-state table
        out = (
            hours.select(
                "symbol",
                "sum_dec",
                "n_ticks",
                "n_vals",
                F.explode(
                    F.array(
                        F.col("hour_ts") - F.expr("INTERVAL 1 HOUR"),
                        F.col("hour_ts"),
                    )
                ).alias("win_start"),
            )
            .groupBy("symbol", "win_start")
            .agg(
                F.sum("n_ticks").alias("n_ticks"),
                F.try_divide(
                    F.sum("sum_dec").cast("double"), F.sum("n_vals")
                ).alias("avg_value"),
            )
            .select(
                "symbol",
                "win_start",
                (F.col("win_start") + F.expr("INTERVAL 2 HOURS")).alias(
                    "win_end"
                ),
                "n_ticks",
                "avg_value",
            )
        )
        # localCheckpoint: the result must outlive the temp dirs
        return out.localCheckpoint()
    finally:
        shutil.rmtree(td, ignore_errors=True)


# --------------------------------------------------------------------------
# Bounded time-RANGE window frames (r10): per-symbol 4-hour sliding sums.
# A RANGE frame is a genuinely different physical operator from the ROWS
# frames used elsewhere — the frame boundary is a VALUE predicate
# (ts' ∈ [ts − 4h, ts], peers included), not a row offset, so duplicate
# timestamps enter every peer's frame on both engines identically.
# --------------------------------------------------------------------------
@register_local(
    "range_frame_sliding_stats",
    oracle="""
    SELECT user_id AS symbol, ts, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             AS roll_sum,
           COUNT(*) OVER w AS roll_n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS roll_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 4 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def range_frame_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark expresses the interval RANGE frame over epoch micros
    (rangeBetween(−4h·1e6, 0) on unix_micros(ts)) — boundary-identical to
    DuckDB's INTERVAL frame at µs precision, inclusive both ends. The sum
    accumulates as decimal inside the frame (order-independent), divided
    in double. One shuffle on the symbol key; the frame scan is a single
    per-partition ordered pass at any scale."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-4 * 3600 * 1_000_000, 0)
    )
    roll_sum = F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast(
        "double"
    )
    roll_n = F.count(F.lit(1)).over(w)
    return ev.select(
        F.col("user_id").alias("symbol"),
        "ts",
        "event_id",
        roll_sum.alias("roll_sum"),
        roll_n.alias("roll_n"),
        (roll_sum / roll_n).alias("roll_avg"),
    )


# --------------------------------------------------------------------------
# Time-hierarchy rollup (r10): hour/day/week grains in ONE fact scan — the
# hypertable "continuous aggregate" shape, expressed as GROUPING SETS so
# Catalyst plans one Expand + one hash aggregate however many grains are
# requested. ONE ANSI text runs on BOTH engines (the _SQL_BOTH_ENGINES
# pattern): grain labels come from GROUPING(), truncations from
# date_trunc (ISO-Monday weeks on both engines).
# --------------------------------------------------------------------------
_TIME_ROLLUP_SQL = """
    SELECT user_id AS symbol,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0 THEN 'hour'
                WHEN GROUPING(date_trunc('day', ts)) = 0 THEN 'day'
                ELSE 'week' END AS grain,
           COALESCE(date_trunc('hour', ts), date_trunc('day', ts),
                    date_trunc('week', ts)) AS bucket_ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY GROUPING SETS (
      (user_id, date_trunc('hour', ts)),
      (user_id, date_trunc('day', ts)),
      (user_id, date_trunc('week', ts))
    )
"""


@register_local("time_hierarchy_rollup", oracle=_TIME_ROLLUP_SQL)
def time_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical SQL text on Spark and DuckDB; Spark side reads events
    through load_events (nanos handling) registered as a temp view. At
    100 TB the Expand triples the aggregate's input rows but the scan
    happens once and the partial aggregates combine map-side — the same
    trade grouping_sets_pricing documents; materialized per-grain tables
    would trade that for storage and staleness (this is the query-time
    form of a continuous aggregate)."""
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(_TIME_ROLLUP_SQL)


@register_local("streaming_time_rollup_parity", oracle=_TIME_ROLLUP_SQL)
def streaming_time_rollup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-hierarchy rollup on the LIVE tick path — the sixteenth
    streaming parity and the incremental-view-maintenance form of a
    continuous aggregate: each micro-batch appends delta-sized partials
    at the FINEST grain only (per-(symbol, hour) decimal sums + counts),
    and the coarser day/week grains are served by RE-AGGREGATING the
    maintained hour state — no second fact scan, the exact trick a
    hypertable uses. Decimal partials reassociate losslessly, so the
    maintained rollup hash-matches the batch GROUPING SETS over raw
    events under any batch split (events replayed as three range-split
    micro-batches, so most buckets span batches and the match proves the
    cross-batch merge law). Per-batch writes land under a
    batch_id-keyed path with overwrite, so a retried foreachBatch
    replaces its own partials instead of double-counting them
    (exactly-once effect over at-least-once execution). State is
    buckets-sized (symbols × hours), never ticks-sized."""
    import shutil
    import tempfile

    from ..streaming.ingest import read_events_stream

    td = tempfile.mkdtemp(prefix="stream_rollup_")
    src_dir = f"{td}/src"
    hours_dir = f"{td}/state_hours"
    try:
        load_events(spark, sf_dir).repartitionByRange(3, "event_id").write.mode(
            "overwrite"
        ).parquet(src_dir)

        def per_batch(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.groupBy(
                    F.col("user_id").alias("symbol"),
                    F.date_trunc("hour", "ts").alias("hour_ts"),
                )
                .agg(
                    F.sum(F.col("value").cast("decimal(38,6)")).alias(
                        "sum_dec"
                    ),
                    F.count(F.lit(1)).alias("n_events"),
                )
                .write.mode("overwrite")
                .parquet(f"{hours_dir}/batch_id={batch_id}")
            )

        q = (
            read_events_stream(spark, src_dir, max_files_per_trigger=1)
            .writeStream.foreachBatch(per_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{td}/_ckpt")
            .start()
        )
        q.awaitTermination()
        hours = (
            spark.read.parquet(hours_dir)
            .groupBy("symbol", "hour_ts")
            .agg(
                F.sum("sum_dec").alias("sum_dec"),
                F.sum("n_events").alias("n_events"),
            )
        )

        def grain(df: DataFrame, label: str, bucket) -> DataFrame:
            return df.groupBy(
                "symbol", bucket.alias("bucket_ts")
            ).agg(
                F.sum("sum_dec").cast("double").alias("sum_value"),
                F.sum("n_events").alias("n_events"),
            ).select(
                "symbol",
                F.lit(label).alias("grain"),
                "bucket_ts",
                "sum_value",
                "n_events",
            )

        out = (
            grain(hours, "hour", F.col("hour_ts"))
            .unionByName(
                grain(hours, "day", F.date_trunc("day", "hour_ts"))
            )
            .unionByName(
                grain(hours, "week", F.date_trunc("week", "hour_ts"))
            )
        )
        # localCheckpoint: the result must outlive the temp dirs
        return out.localCheckpoint()
    finally:
        shutil.rmtree(td, ignore_errors=True)
