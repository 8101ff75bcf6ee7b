"""ks_drift_matrix differentials: a pure-Python exact two-sample KS
recompute (independent of both engines' window machinery), and planted
distributions — identical samples give KS 0, a shifted sample is
detected."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F

from stock_market_big_data_project_spark.operators.text import quality_score
from stock_market_big_data_project_spark.plans import (
    get_query,
    LOCAL_QUERIES,
    load_all_plans,
)
from stock_market_big_data_project_spark.sources.tables import load_table

from .conftest import SF_DIR

load_all_plans()


def _ks_exact(xs: list[float], ys: list[float]) -> Fraction:
    """max_x |F_a(x) - F_b(x)| over the merged grid, exact rationals."""
    na, nb = len(xs), len(ys)
    grid = sorted(set(xs) | set(ys))
    best = Fraction(0)
    for g in grid:
        fa = Fraction(sum(1 for v in xs if v <= g), na)
        fb = Fraction(sum(1 for v in ys if v <= g), nb)
        best = max(best, abs(fa - fb))
    return best


def test_ks_matches_pure_python(spark):
    d = load_table(spark, SF_DIR, "documents")
    s = d.select("source", quality_score(F.col("text")).alias("q")).filter(
        F.col("q").isNotNull()
    )
    by_src: dict = {}
    for r in s.collect():
        by_src.setdefault(r.source, []).append(float(r.q))
    got = get_query("ks_drift_matrix")(spark, SF_DIR).collect()
    assert len(got) == len(by_src) * (len(by_src) - 1) // 2
    for r in got:
        xs, ys = by_src[r.src_a], by_src[r.src_b]
        assert r.n_a == len(xs) and r.n_b == len(ys)
        exact = _ks_exact(xs, ys)
        assert Fraction(r.ks_num, r.n_a * r.n_b) == exact, (r.src_a, r.src_b)


def test_ks_planted_distributions(spark):
    rows = []
    # sources "same1"/"same2": identical value multisets -> KS = 0
    for i in range(50):
        txt = " ".join(f"w{j}" for j in range(10 + i % 5))
        rows.append((i, txt, "same1"))
        rows.append((1000 + i, txt, "same2"))
    # source "shifted": much longer docs -> higher quality score
    for i in range(50):
        txt = " ".join(f"w{j}" for j in range(60))
        rows.append((2000 + i, txt, "shifted"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    td = f"/tmp/ks_planted_{id(df)}"
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
    got = {
        (r.src_a, r.src_b): r
        for r in get_query("ks_drift_matrix")(spark, td).collect()
    }
    assert got[("same1", "same2")].ks_stat == 0.0
    assert got[("same1", "shifted")].ks_stat == 1.0  # disjoint supports
    assert got[("same2", "shifted")].ks_stat == 1.0


def test_blank_doc_oracle_parity(spark):
    """ADVICE r7: a whitespace-only/empty doc must be dropped IDENTICALLY
    by both engines — Spark's tokens() yields 0 tokens (NULL score) while
    DuckDB's string_split_regex(trim('')) yields [''] — the oracle now
    guards with a blank-text CASE. Runs the full bitwise compare on a
    fixture that contains blank docs (the shipped fixtures don't)."""
    import duckdb

    from stock_market_big_data_project_spark.plans import (
        LOCAL_ORACLES,
        LOCAL_QUERIES,
        ORACLES,
        QUERIES,
    )

    from .oracle_utils import compare

    all_q = {**QUERIES, **LOCAL_QUERIES}
    all_o = {**ORACLES, **LOCAL_ORACLES}

    rows = []
    for i in range(40):
        rows.append((i, " ".join(f"w{j}" for j in range(5 + i % 7)), "a"))
        rows.append((100 + i, " ".join("the for and".split()[: 1 + i % 3]), "b"))
    rows += [(200, "", "a"), (201, "   ", "b"), (202, "\t\n ", "a")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    td = f"/tmp/ks_blank_{id(df)}"
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{td}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{td}/documents.parquet/*.parquet')"
    )
    for name in (
        "ks_drift_matrix",
        "schema_evolution_read",
        "length_bucketed_batches",
        "dedup_normalized_exact",
    ):
        sdf = all_q[name](spark, td)
        pdf = con.execute(all_o[name]).fetchdf()
        errs = compare(sdf, pdf, name)
        assert not errs, "\n".join(errs)
    con.close()
