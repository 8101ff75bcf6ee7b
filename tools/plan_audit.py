"""Regenerate PLANS.md facts for a set of queries.

Usage: python tools/plan_audit.py [query ...]   (default: bench HEADLINE)

Runs with AQE disabled so the static physical plan (codegen ids, join
strategies) is visible; production runs AQE on, which can only improve on
what is shown (coalescing, skew splitting, dynamic broadcast).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from stock_market_big_data_project_spark.plans import (
    LOCAL_QUERIES,
    QUERIES,
    load_all_plans,
)

SF = "/root/testdata/sf0.1"


def audit(spark: SparkSession, name: str) -> str:
    df = {**LOCAL_QUERIES, **QUERIES}[name](spark, SF)
    jvm = df._sc._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    txt = df._jdf.queryExecution().explainString(mode)
    tree = txt.split("\n\n")[0]

    def n(pat: str) -> int:
        return len(re.findall(rf"\b{pat}\b", tree))

    wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", txt)))
    arrow = n("ArrowEvalPython") + n("FlatMapGroupsInPandas") + n("MapInPandas")
    pushed = sorted(
        set(m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", txt)) - {""}
    )
    cols = sorted(
        set(
            c
            for m in re.findall(r"ReadSchema: struct<([^>\n]*)", txt)
            for c in re.findall(r"(\w+):", m)
        )
    )
    return "\n".join(
        [
            f"## {name}",
            "",
            f"- joins: {n('BroadcastHashJoin')} broadcast-hash, {n('SortMergeJoin')} sort-merge, "
            f"{n('BroadcastNestedLoopJoin')} broadcast-nested-loop, {n('CartesianProduct')} cartesian",
            f"- exchanges (shuffles/broadcasts): {n('Exchange') + n('BroadcastExchange')}; "
            f"whole-stage-codegen spans: {wsc}; arrow/python stages: {arrow}",
            f"- pushed filters: {pushed if pushed else 'none (full scan by design or filter not pushable)'}",
            f"- scanned columns: {', '.join(cols)}",
            "",
        ]
    )


def main() -> None:
    load_all_plans()
    if len(sys.argv) > 1:
        names = sys.argv[1:]
    else:
        from bench import EXTRA, HEADLINE

        names = HEADLINE + EXTRA
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    for name in names:
        print(audit(spark, name))


if __name__ == "__main__":
    main()
