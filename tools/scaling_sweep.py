"""Cross-SF scaling sweep: time a representative query slice at
sf0.001 / sf0.01 / sf0.1 and report the wall-clock scaling ratios —
measured evidence for the 100 TB extrapolation argument in SCALE.md.

A plan that survives scale-up shows sub-linear-to-linear growth between
10× data steps (fixed JVM/planning overhead amortizes; per-row work
scales with data).  Super-linear growth between steps is the smell the
sweep exists to catch (accidental quadratic pair spaces, driver-side
materialization).

Usage: python tools/scaling_sweep.py [query ...]
Prints one JSON line: {query: {sf: seconds, ..., "r_01_001": x,
"r_1_01": y}} with each timing the min of 2 consecutive runs (the
steady-state rule from bench.py).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_market_big_data_project_spark.plans import (
    LOCAL_QUERIES,
    QUERIES,
    load_all_plans,
)
from stock_market_big_data_project_spark.session import get_spark

SFS = ["sf0.001", "sf0.01", "sf0.1"]

# Data root: the same SPARK_GRAFT_SF_DIR convention bench.py uses (the
# sweep's comparability-with-bench goal covers the data location too).
# The env var names one SF directory; the sweep substitutes each sweep SF
# for its trailing component.  Fallback matches bench.py's default.
# Validated up front (ADVICE r10): a custom layout whose final component
# is not an sfX.Y directory — or a bare/relative path whose dirname is
# '' — would otherwise silently resolve wrong sibling paths and fail
# confusingly at read time.
_SF_DIR_ENV = os.path.abspath(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
)
if not re.fullmatch(r"sf[\d.]+", os.path.basename(_SF_DIR_ENV)):
    raise SystemExit(
        f"SPARK_GRAFT_SF_DIR={_SF_DIR_ENV!r}: final path component must be "
        "an sf<N> directory (e.g. /root/testdata/sf0.1) — the sweep "
        "substitutes sibling sf dirs for it"
    )
_TESTDATA_ROOT = os.path.dirname(_SF_DIR_ENV)

# Optional fourth decade (VERDICT r10 #3): a locally generated
# sf1-equivalent directory (tools/gen_sf1.py) appended as a sweep point
# when SPARK_GRAFT_SF1_DIR is set — it lives outside the read-only
# testdata root, so it is named explicitly instead of by sibling
# substitution.
_SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR")
DEFAULT = [
    "q1_pricing_summary",        # scan -> agg
    "revenue_by_region",         # multi-join
    "quantiles_by_priority",     # window order statistics
    "dedup_minhash_lsh",         # banded candidate join
    "bm25_retrieval_topk",       # retrieval scoring
    "technical_indicators_bundle",  # window stack
    "symspell_fuzzy_join_dist1",    # deletion-key blocking join
    "copurchase_association_rules",  # within-order self-join
    "scd2_user_history",         # gaps-and-islands
    "json_extraction_bundle",    # semi-structured scan
]


def main() -> None:
    load_all_plans()
    names = sys.argv[1:] or DEFAULT
    # the bench session factory, not a hand-rolled builder: the sweep's
    # whole point is comparability with bench.py, so it must run under
    # the identical engine config (AQE, UTC, driver memory, codegen
    # cache) — review fix
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    all_q = {**LOCAL_QUERIES, **QUERIES}
    # (label, directory) sweep points: the three testdata SFs by sibling
    # substitution, plus the optional generated sf1 decade. Existence is
    # checked BEFORE any Spark work (ADVICE r10).
    points = [(sf, os.path.join(_TESTDATA_ROOT, sf)) for sf in SFS]
    if _SF1_DIR:
        points.append(("sf1", os.path.abspath(_SF1_DIR.rstrip("/"))))
    for label, d in points:
        if not os.path.isdir(d):
            raise SystemExit(
                f"sweep point {label}: directory {d!r} does not exist "
                "(check SPARK_GRAFT_SF_DIR / SPARK_GRAFT_SF1_DIR)"
            )
    out: dict = {}
    for name in names:
        fn = all_q[name]
        row: dict = {}
        raw: dict = {}
        raw_serve: dict = {}
        for sf, sf_dir in points:
            best = None
            serve = None
            for _ in range(2):  # consecutive repeats; min = steady state
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                # SERVING-path time: re-save the SAME DataFrame. For lazy
                # plans this re-runs the whole plan (≈ the number above);
                # for queries that eagerly stage state at build time (the
                # BM25 candidate checkpoint, the graph iterations) it
                # isolates the post-build path — the cost a repeated
                # workload actually pays per query. Telling the two apart
                # is exactly what the bm25 4.3× "outlier" needed: its
                # build is corpus-linear BY DESIGN, its serving path is
                # candidate-bounded (VERDICT r9 #3).
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                ds = time.perf_counter() - t0
                serve = ds if serve is None else min(serve, ds)
                # drop orphaned shuffle/broadcast state NOW so the next
                # timing doesn't pay this run's cleanup debt (bench.py's
                # steady-state rule)
                spark.sparkContext._jvm.System.gc()
            raw[sf] = best
            raw_serve[sf] = serve
            row[sf] = round(best, 3)
            row[f"{sf}_serve"] = round(serve, 3)
        # ratios over the UN-rounded floats (rounding can hit 0.0 on a
        # sub-millisecond run and divide by zero)
        row["r_01_001"] = round(raw["sf0.01"] / max(raw["sf0.001"], 1e-6), 2)
        row["r_1_01"] = round(raw["sf0.1"] / max(raw["sf0.01"], 1e-6), 2)
        row["r_1_01_serve"] = round(
            raw_serve["sf0.1"] / max(raw_serve["sf0.01"], 1e-6), 2
        )
        if "sf1" in raw:
            row["r_sf1_sf01"] = round(raw["sf1"] / max(raw["sf0.1"], 1e-6), 2)
            row["r_sf1_sf01_serve"] = round(
                raw_serve["sf1"] / max(raw_serve["sf0.1"], 1e-6), 2
            )
        out[name] = row
        print(f"  {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
