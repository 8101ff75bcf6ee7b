"""Query registry — the engine's declared query surface.

Every operator from SURVEY.md §2 registers here as a named query:

    @register("q_name", oracle="SELECT ... AS same_col_names ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

``__spark_entry__.queries()`` / ``oracle_sql()`` read straight from this
registry; the driver runs both sides and hash-compares (row count + schema +
order-insensitive value hash). Column names are part of the contract —
alias identically on both sides. Queries whose semantics are not
SQL-expressible (stateful streaming, iterative ML) register with
``oracle=None`` and get the driver's rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Local-only tier: the driver caps CORRECTNESS at 50 queries, so narrow
# single-operator queries that a registered bundle already covers live here
# instead — still oracle-checked by tests/test_oracle_parity.py at sf0.001
# and benchable by name, but not exported through __spark_entry__.queries().
LOCAL_QUERIES: dict[str, QueryFn] = {}
LOCAL_ORACLES: dict[str, str] = {}

_PLAN_MODULES = (
    "market",
    "relational",
    "subqueries",
    "llm",
    "statistical",
    "training",
    "retrieval",
    "linkage",
    "eventflow",
    "warehouse",
    # bundles LAST: it composes the other modules' registered queries +
    # oracles into per-family driver rows (it also imports the siblings
    # itself, so direct imports work too)
    "bundles",
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in LOCAL_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def register_local(
    name: str, oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register into the local-only tier (oracle-parity-tested + benchable,
    NOT sent to the driver — see LOCAL_QUERIES)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES or name in LOCAL_QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        LOCAL_QUERIES[name] = fn
        if oracle is not None:
            LOCAL_ORACLES[name] = oracle
        return fn

    return deco


def load_all_plans() -> None:
    """Import every plan module so registrations run (idempotent)."""
    for mod in _PLAN_MODULES:
        importlib.import_module(f"{__package__}.{mod}")


def get_query(name: str) -> QueryFn:
    """Tier-agnostic lookup (driver or local) — tests use this so that
    per-round driver-slot rotations never touch them."""
    load_all_plans()
    if name in QUERIES:
        return QUERIES[name]
    return LOCAL_QUERIES[name]
