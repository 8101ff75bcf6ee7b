"""Time individual registered queries via the noop sink (guide §1.4).

Usage: python tools/time_queries.py [-n RUNS] <query> [query ...]

Same methodology as bench.py's run_set (best-of-N consecutive repeats,
GC between runs, noop sink, $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS), for
fast before/after iteration on a subset without a full bench pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stock_market_big_data_project_spark.plans import (
    LOCAL_QUERIES,
    QUERIES,
    load_all_plans,
)
from stock_market_big_data_project_spark.session import get_spark


def main() -> int:
    load_all_plans()
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    all_q = {**LOCAL_QUERIES, **QUERIES}

    # the same engine-path warmup as bench.py, so first-query numbers are
    # not dominated by first-use codegen/shuffle machinery
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stock_market_big_data_project_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    ev.groupBy("event_type").count().write.format("noop").mode("overwrite").save()
    w = Window.partitionBy("event_type").orderBy("ts")
    ev.select(F.row_number().over(w).alias("rn"), F.lag("value").over(w)).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, float] = {}
    for name in args:
        spark.sparkContext.setJobDescription(name)
        for r in range(n_runs):
            df = all_q[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 3)
            out[name] = min(out.get(name, t), t)
            print(f"  [{r}] {name}: {t}s", file=sys.stderr, flush=True)
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
