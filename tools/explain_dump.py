"""Dump `.explain("formatted")` for named queries to plans/<round>/ files.

Usage: python tools/explain_dump.py <suffix> <query> [query ...]
       python tools/explain_dump.py before symspell_fuzzy_join_dist2 ...

Writes plans/$SPARK_GRAFT_ROUND/<query>_<suffix>.txt for each name
(driver or local tier), at $SPARK_GRAFT_SF_DIR (default sf0.1). The
round directory comes from $SPARK_GRAFT_ROUND (default r13) so a new
optimization round cannot silently overwrite the previous round's
committed plan artifacts (ADVICE r12). AQE stays ON (the shipped
configuration): the dump records the initial adaptive plan — join
strategies, exchanges, pushed filters — exactly what the optimization
round's before/after claims are about. Queries that execute streams or
iterative checkpoints at build time dump their audited pre-checkpoint
constituent when one is registered (same rule as tools/plan_audit.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_market_big_data_project_spark.plans import (
    LOCAL_QUERIES,
    QUERIES,
    load_all_plans,
)
from stock_market_big_data_project_spark.plans.audit import EAGER_ITERATIVE
from stock_market_big_data_project_spark.session import get_spark

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_ROUND", "r13"),
)


def main() -> int:
    load_all_plans()
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-dump")
    os.makedirs(OUT_DIR, exist_ok=True)
    all_q = {**LOCAL_QUERIES, **QUERIES}
    for name in names:
        fn = EAGER_ITERATIVE.get(name) or all_q[name]
        df = fn(spark, sf_dir)
        jvm = df._sc._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
