"""Driver pre-flight: run every driver-tier query under a VANILLA ANSI
SparkSession (no tuned knobs — the external driver's shape) at sf0.01 and
compare against its DuckDB oracle with the local bitwise canonicalizer.

This is the standing promotion gate (SCALE.md): a query only rotates into
a driver CORRECTNESS slot after passing this exact check, so the driver's
own run cannot surprise.

Usage:  python tools/driver_preflight.py [sf_dir] [name ...]
        (default sf_dir /root/testdata/sf0.01; default names = all driver
        queries; pass names to re-check a subset)
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_HERE,):
    if p not in sys.path:
        sys.path.insert(0, p)

from pyspark.sql import SparkSession

from stock_market_big_data_project_spark.plans import (
    ORACLES,
    QUERIES,
    load_all_plans,
)
from tests.oracle_utils import compare, duckdb_conn


def main() -> int:
    load_all_plans()
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args or sorted(QUERIES)

    # Vanilla ANSI session: defaults everywhere except what correctness
    # itself requires (UTC timestamps match the fixtures' naive-UTC).
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("driver-preflight")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf_dir)

    failed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            if name in ORACLES:
                pdf = con.execute(ORACLES[name]).fetchdf()
                errs = compare(sdf, pdf, name)
                status = "HASH-OK" if not errs else "FAIL"
                if errs:
                    failed.append(name)
                    for e in errs[:3]:
                        print(f"    {e}")
            else:
                n = sdf.count()
                status, errs = f"ROWS-ONLY({n})", []
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            status, _ = "ERROR", None
            failed.append(name)
            print(f"    {type(exc).__name__}: {exc}")
        print(f"{name:45s} {status:14s} {time.time() - t0:6.1f}s", flush=True)

    print(f"\n{len(names) - len(failed)}/{len(names)} green")
    if failed:
        print("FAILED:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
