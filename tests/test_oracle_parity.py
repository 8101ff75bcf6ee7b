"""Every registered query with an oracle must match DuckDB bitwise at
sf0.001 — the local pre-flight for the driver's sf0.01 CORRECTNESS gate."""

from __future__ import annotations

import pytest

from stock_market_big_data_project_spark.plans import ORACLES, QUERIES, load_all_plans

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_conn

load_all_plans()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, oracle_con):
    spark_df = QUERIES[name](spark, SF_DIR)
    oracle_pdf = oracle_con.execute(ORACLES[name]).fetchdf()
    errs = compare(spark_df, oracle_pdf, name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
