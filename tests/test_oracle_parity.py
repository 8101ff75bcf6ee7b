"""Every registered query with an oracle must match DuckDB bitwise at
sf0.001 — the local pre-flight for the driver's sf0.01 CORRECTNESS gate."""

from __future__ import annotations

import pytest

from stock_market_big_data_project_spark.plans import (
    LOCAL_ORACLES,
    LOCAL_QUERIES,
    ORACLES,
    QUERIES,
    load_all_plans,
)

from .conftest import SF_DIR
from .oracle_utils import compare, duckdb_conn

load_all_plans()

# Driver-facing and local-only tiers get the identical parity check — the
# local tier exists only because the driver caps CORRECTNESS at 50 queries.
ALL_QUERIES = {**QUERIES, **LOCAL_QUERIES}
ALL_ORACLES = {**ORACLES, **LOCAL_ORACLES}


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_parity(name, spark, oracle_con):
    spark_df = ALL_QUERIES[name](spark, SF_DIR)
    oracle_pdf = oracle_con.execute(ALL_ORACLES[name]).fetchdf()
    errs = compare(spark_df, oracle_pdf, name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLES)))
def test_rows_only(name, spark):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
