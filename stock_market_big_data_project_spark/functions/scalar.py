"""Scalar/aggregate expression helpers (OP-49..OP-60 + exact aggregation).

``exact_sum``/``exact_avg`` implement the engine's cross-engine-deterministic
aggregation pattern: per-row arithmetic stays in double (IEEE ops are
bit-identical everywhere), the *aggregation* happens in DECIMAL(38,6) (exact,
order-independent — immune to shuffle/partition ordering), and the result is
converted to double at the end. This is also the right pattern at 100 TB:
partial aggregation (map-side combine) stays enabled, and results don't drift
between runs with different partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EXACT_DECIMAL = "decimal(38,6)"


def exact_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum: decimal accumulation, double result."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(EXACT_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.try_divide(
        F.sum(c.cast(EXACT_DECIMAL)).cast("double"), F.count(c)
    )
    return out.alias(alias) if alias else out


def oracle_exact_sum(expr: str) -> str:
    """DuckDB side of exact_sum — keep in lockstep with the Spark helper.

    The decimal→double conversion routes through VARCHAR (r12): DuckDB's
    direct CAST(DECIMAL(38,6) AS DOUBLE) computes (double)int128 / 1e6 —
    TWO roundings — which diverges from Spark's correctly-rounded
    BigDecimal→double by 1 ULP once the scaled sum exceeds 2⁵³ (first
    observed at the sf1 decade: q1's sum_charge, two groups off by one
    bit). The decimal STRING → double parse is a single correct rounding,
    identical to Spark at every magnitude; below 2⁵³ both forms agree, so
    all official-SF hashes are unchanged."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"


def oracle_exact_avg(expr: str) -> str:
    return f"{oracle_exact_sum(expr)} / count({expr})"


def neg_log10_guarded(p: Column | str) -> Column:
    """OP-55 — ``-log10(p)`` with the reference's zero guard
    (dashboard/app.py:411: p==0 → 1e-10). Rounded by callers: log10 is not
    bit-identical across libm implementations."""
    c = F.col(p) if isinstance(p, str) else p
    return -F.log10(F.when(c == 0, F.lit(1e-10)).otherwise(c))


def first_token(col: Column | str) -> Column:
    """OP-50 — ``re.split(r'\\s|[:\\-]', col)[0]`` (integrate/main.py:26)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s|[:\-]")[0]


def is_ticker_token(col: Column) -> Column:
    """OP-50 — ``re.fullmatch(r'[A-Z]{1,5}', token)`` (integrate/main.py:27)."""
    return col.rlike("^[A-Z]{1,5}$")
