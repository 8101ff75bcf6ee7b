"""Mini-driver: replicate the driver's DuckDB-oracle comparison locally.

Stricter than the driver on purpose — cells are canonicalized bitwise
(float.hex for doubles) so any engine-order nondeterminism or float drift
shows up here first, at sf0.001, before the driver's sf0.01 run.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from stock_market_big_data_project_spark.sources.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f.hex()
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        t = pd.Timestamp(v)
        if t.tzinfo is not None:
            t = t.tz_convert("UTC").tz_localize(None)
        return t.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_cell(v) if not (isinstance(v, float) and pd.isna(v)) else "NULL" for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    errs: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        errs.append(
            f"{name}: column mismatch spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return errs
    if len(spdf) != len(oracle_pdf):
        errs.append(f"{name}: row count spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canonicalize(spdf), canonicalize(oracle_pdf)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        errs.append(
            f"{name}: value mismatch; spark-only={diff_a} oracle-only={diff_b} "
            f"cols={sorted(spdf.columns)}"
        )
    return errs
