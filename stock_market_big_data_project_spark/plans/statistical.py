"""Statistical / ML queries (SURVEY.md §2.10): correlation matrix (OP-30/67),
Granger causality (OP-65), recursive forecasting (OP-66).

The shared input is the integrated-style hourly wide table built from
``events`` (hour × symbol grid, one column per event_type — the analog of
the reference's integrated_all, integrate/main.py:95-126).

The correlation matrix is oracle-checked (decimal-exact moments). Granger
and the forecaster are not SQL-expressible (iterative OLS / recursive
prediction) — they register without oracles and get the driver's rows-only
check, plus numeric unit tests in tests/test_stats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cleaning import hour_floor
from ..operators.stats import corr_pairs_exact, granger_causality, recursive_forecast
from ..sources.tables import load_table
from .registry import register, register_local

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def hourly_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(symbol, hour_ts, click, error, purchase, signup, view): per-symbol
    hourly grid with positional-last per (hour, type) — the reference's
    integrated wide table re-expressed as one pivot aggregate."""
    ev = load_table(spark, sf_dir, "events").withColumn("hour_ts", hour_floor("ts"))
    return (
        ev.groupBy(F.col("user_id").alias("symbol"), "hour_ts")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.expr("max_by(value, struct(ts, event_id))"))
    )


def daily_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(symbol, day_ts, feature, value) long form — feeds the set-based
    correlation; daily grain so pairwise-complete observations exist at
    every scale factor (hourly cells are mostly empty in this stream)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day_ts", F.date_trunc("day", "ts")
    )
    return ev.groupBy(
        F.col("user_id").alias("symbol"),
        "day_ts",
        F.col("event_type").alias("feature"),
    ).agg(F.expr("max_by(value, struct(ts, event_id))").alias("value"))


@register(
    "correlation_matrix",
    oracle="""
    WITH long AS (
      SELECT user_id AS symbol, date_trunc('day', ts) AS day_ts,
             event_type AS feature,
             last(value ORDER BY ts, event_id) AS value
      FROM events GROUP BY 1, 2, 3
    ), pairs AS (
      SELECT a.symbol, a.feature AS f1, b.feature AS f2, a.value AS x, b.value AS y
      FROM long a JOIN long b
        ON a.symbol = b.symbol AND a.day_ts = b.day_ts
    ), m AS (
      SELECT symbol, f1, f2, count(*) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM pairs GROUP BY 1, 2, 3
    ), c AS (
      SELECT symbol, f1, f2,
             CASE WHEN n < 3 THEN NULL
                  WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN round((n * sxy - sx * sy)
                             / (sqrt(n * sxx - sx * sx)
                                * sqrt(n * syy - sy * sy)), 9) END AS corr
      FROM m
    )
    SELECT symbol, f1 AS feature,
           max(CASE WHEN f2 = 'click' THEN corr END) AS click,
           max(CASE WHEN f2 = 'error' THEN corr END) AS error,
           max(CASE WHEN f2 = 'purchase' THEN corr END) AS purchase,
           max(CASE WHEN f2 = 'signup' THEN corr END) AS signup,
           max(CASE WHEN f2 = 'view' THEN corr END) AS view
    FROM c GROUP BY 1, 2
    """,
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-30/OP-67 (analysis_part/main.py:51-55) — one square Pearson
    correlation matrix PER SYMBOL (the reference writes one CSV artifact
    per symbol; here all of them are ONE plan, no per-symbol loop): melt →
    per-(symbol, day) self-join (pairwise-complete observations, pandas
    corr semantics) → decimal-exact moments → closed form → pivot to the
    square artifact shape, diagonal included (corr(f,f) = 1 where variance
    > 0, NULL on degenerate pairs)."""
    long = daily_long(spark, sf_dir)
    a = long.select(
        "symbol", F.col("feature").alias("f1"), "day_ts", F.col("value").alias("x")
    )
    b = long.select(
        "symbol", F.col("feature").alias("f2"), "day_ts", F.col("value").alias("y")
    )
    pairs = a.join(b, ["symbol", "day_ts"])
    dec = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    m = pairs.groupBy("symbol", "f1", "f2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (F.col("n") >= 3) & (vx > 0) & (vy > 0),
        F.round(
            F.try_divide(n * F.col("sxy") - F.col("sx") * F.col("sy"),
                         F.sqrt(vx) * F.sqrt(vy)),
            9,
        ),
    )
    c = m.select("symbol", "f1", "f2", corr.alias("corr"))
    return (
        c.groupBy("symbol", F.col("f1").alias("feature"))
        .pivot("f2", EVENT_TYPES)
        .agg(F.max("corr"))
    )


@register_local(
    "correlation_pairs_long",
    oracle="""
    WITH long AS (
      SELECT user_id AS symbol, date_trunc('day', ts) AS day_ts,
             event_type AS feature,
             last(value ORDER BY ts, event_id) AS value
      FROM events GROUP BY 1, 2, 3
    ), pairs AS (
      SELECT a.symbol, a.feature AS f1, b.feature AS f2, a.value AS x, b.value AS y
      FROM long a JOIN long b
        ON a.symbol = b.symbol AND a.day_ts = b.day_ts AND a.feature < b.feature
    ), m AS (
      SELECT symbol, f1, f2, count(*) AS n,
             CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM pairs GROUP BY 1, 2, 3
    )
    SELECT symbol, f1, f2, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
           END AS corr
    FROM m WHERE n >= 3
    """,
)
def correlation_pairs_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The long (symbol, f1, f2, n, corr) pairwise form via the reusable
    `corr_pairs_exact` operator. Local-only: the registered
    `correlation_matrix` covers the same moments in artifact shape."""
    return corr_pairs_exact(
        daily_long(spark, sf_dir), "symbol", "day_ts", "feature", "value",
        min_n=3,
    )


@register("granger_causality")  # no oracle: iterative OLS + F-sf, rows-only check
def granger_causality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-65 (analysis_part/main.py:58-78) — does each other event series
    Granger-cause 'click', per symbol, lags 1..5? applyInPandas UDTF with
    numpy OLS and an own-implementation F survival function (no statsmodels
    here); reference knobs preserved: maxlag 5, min-rows guard maxlag+2,
    5 dp rounding, error rows on failure.

    Input is the hourly wide table with per-symbol forward-fill (the
    reference Grangers the *integrated* table, whose macro columns are
    ffilled — integrate/main.py:72): without the fill the hourly cells are
    too sparse for pairwise-complete observations at any scale factor."""
    from pyspark.sql import Window

    wide = hourly_wide(spark, sf_dir)
    w = (
        Window.partitionBy("symbol")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in EVENT_TYPES:
        wide = wide.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return granger_causality(
        wide,
        key_col="symbol",
        target_col="click",
        predictor_cols=["error", "purchase", "signup", "view"],
        maxlag=5,
    )


@register("recursive_forecast")  # no oracle: recursive prediction, rows-only check
def recursive_forecast_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-66 (analysis_part/main.py:81-125) — per symbol: 24 lag features,
    80/20 temporal split, fit, test RMSE, 168-step recursive forecast.
    xgboost (reference's exact hyperparameters) behind an import-try; closed-
    form ridge otherwise. applyInPandas: all symbols train in parallel."""
    ev = load_table(spark, sf_dir, "events")
    series = ev.select(
        F.col("user_id").alias("symbol"), F.col("ts").alias("hour_ts"), F.col("value")
    )
    return recursive_forecast(
        series, key_col="symbol", ts_col="hour_ts", val_col="value",
        n_lags=24, horizon=168, train_frac=0.8,
    )


# --------------------------------------------------------------------------
# Sketch aggregates — the 100 TB scale path for distinct-count and quantile.
# No oracle (HLL++ / KLL internals are engine-specific); accuracy is bounded
# against the exact answers in tests/test_sketches.py instead.
# --------------------------------------------------------------------------
@register("approx_sketch_bundle")  # no oracle: sketch estimates, rows-only check
def approx_sketch_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch twins in ONE pass: HyperLogLog++ distinct users (rsd 1%)
    and KLL-style p50/p90/p99 value quantiles per event_type. One groupBy,
    both sketch states merged map-side — the 100 TB shape for
    distinct-count and quantile (exact twins: `distinct_segments`,
    `quantiles_by_priority`). Accuracy is bounded against exact answers in
    tests/test_sketches.py; sketch internals are engine-specific, so this
    registers rows-only."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        q.getItem(0).alias("p50_value"),
        q.getItem(1).alias("p90_value"),
        q.getItem(2).alias("p99_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register_local("approx_distinct_sketch")  # no oracle: HLL estimate, rows-only
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event_type (rsd 1%). Unlike exact
    COUNT(DISTINCT) — whose Expand+double-shuffle plan moves every distinct
    key — the sketch is a fixed ~4 KB state per group merged map-side, so
    network cost is O(groups), not O(distinct keys): the only viable
    distinct-count at 100 TB."""
    # Deliberately NOT repartitioned: each partial partition materializes a
    # 2^14-register (~16 KB) sketch per group, so sketch-merge cost scales
    # with partitions × groups — measured 0.88 s at 32 partitions vs 0.50 s
    # at 1 for the same data. At 100 TB that same math says: keep rsd as
    # coarse as the use case allows, and don't over-partition upstream of a
    # high-precision HLL.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register_local("approx_quantile_sketch")  # no oracle: sketch estimate, rows-only
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style mergeable sketch) of event value per
    event_type: p50/p90/p99 in one pass with bounded error (accuracy 10000 →
    ±0.01%%-ile), vs the exact window plan in quantiles_by_priority which
    must shuffle + sort every row. The exact twin is the correctness oracle;
    this is what actually runs at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            q.getItem(0).alias("p50_value"),
            q.getItem(1).alias("p90_value"),
            q.getItem(2).alias("p99_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
