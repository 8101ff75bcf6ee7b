"""Accuracy bounds for the sketch aggregates (approx_distinct_sketch /
approx_quantile_sketch) against their exact counterparts — the rows-only
queries still have to be *close*, not just runnable."""

from __future__ import annotations

import pyspark.sql.functions as F

from stock_market_big_data_project_spark.plans import (
    LOCAL_QUERIES,
    load_all_plans,
)
from stock_market_big_data_project_spark.sources.tables import load_table

from .conftest import SF_DIR

load_all_plans()


def test_approx_distinct_within_rsd(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in LOCAL_QUERIES["approx_distinct_sketch"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        # rsd=0.01 → 1% standard error; 5 sigma margin never flakes.
        assert abs(approx[et] - n) <= max(5, 0.05 * n), (et, approx[et], n)


def test_approx_quantiles_bracket_exact_rank(spark):
    approx = LOCAL_QUERIES["approx_quantile_sketch"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    for row in approx:
        vals = sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == row["event_type"])
            .select("value")
            .collect()
        )
        n = len(vals)
        for p, col in ((0.5, "p50_value"), (0.9, "p90_value"), (0.99, "p99_value")):
            # sketch answer must sit within ±1% of the target rank
            lo = vals[max(0, int((p - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((p + 0.01) * n))]
            assert lo <= row[col] <= hi, (row["event_type"], col, row[col], lo, hi)


def test_sketch_merge_rollup_accuracy_and_losslessness(spark):
    # The mergeable-sketch claim (plans/training.py::sketch_merge_rollup):
    # per-source HLL estimates within rsd of exact, AND the union of
    # per-source sketches is LOSSLESS — identical estimate to one sketch
    # built over the whole corpus (same lgk), which is what makes
    # persisted per-day sketch bytes a sound incremental representation.
    from pyspark.sql import functions as F

    from stock_market_big_data_project_spark.operators.text import tokens
    from stock_market_big_data_project_spark.plans import (
        LOCAL_QUERIES,
        load_all_plans,
    )
    from stock_market_big_data_project_spark.sources.tables import load_table

    load_all_plans()
    got = {
        r.source: r.est_distinct_tokens
        for r in LOCAL_QUERIES["sketch_merge_rollup"](spark, SF_DIR).collect()
    }
    toks = load_table(spark, SF_DIR, "documents").select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    exact = {
        r.source: r.n
        for r in toks.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    exact["__all__"] = toks.select("tok").distinct().count()
    assert set(got) == set(exact)
    for src, est in got.items():
        assert abs(est - exact[src]) <= max(2, 0.05 * exact[src]), (
            src, est, exact[src],
        )
    whole = (
        toks.agg(F.hll_sketch_agg("tok", F.lit(12)).alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0]
        .est
    )
    assert got["__all__"] == whole


# --- count-min sketch ---------------------------------------------------------------


def test_countmin_merge_law_and_no_underestimate(spark):
    """The CMS scale contract: (1) sketches of disjoint corpus halves
    merge CELL-WISE into the whole-corpus sketch (exact integer
    addition — the per-shard persist-and-merge pattern), and (2) the
    estimate never underestimates ANY token, not just the top-20 the
    registered query reports."""
    import pyspark.sql.functions as F

    from stock_market_big_data_project_spark.operators.text import (
        md5_hash64,
        tokens,
    )
    from stock_market_big_data_project_spark.sources.tables import load_table

    d = load_table(spark, SF_DIR, "documents")
    t = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))

    def sketch(df):
        jb = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            md5_hash64(F.concat(F.lit(f"cm{j}:"), F.col("tok"))),
                            F.lit(1024),
                        ).alias("b"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("s")
        return {
            (r.j, r.b): r.c
            for r in df.select(jb)
            .select(F.col("s.j").alias("j"), F.col("s.b").alias("b"))
            .groupBy("j", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    whole = sketch(t)
    lo = sketch(t.filter(F.col("doc_id") % 2 == 0))
    hi = sketch(t.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for part in (lo, hi):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole

    exact = {
        r.tok: r.c
        for r in t.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    import hashlib

    for tok, cnt in exact.items():
        est = min(
            whole[(j, int(hashlib.md5(f"cm{j}:{tok}".encode()).hexdigest()[:15], 16) % 1024)]
            for j in range(4)
        )
        assert est >= cnt
