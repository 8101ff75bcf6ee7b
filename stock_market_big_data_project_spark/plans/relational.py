"""Relational-core queries on the TPC-H-ish tables (joins, aggregates,
top-k, scalar functions — SURVEY.md §2.3/§2.4/§2.6/§2.8).

``lineitem``/``orders`` are the fact tables; ``customer``/``supplier``/
``nation``/``region``/``part`` the broadcastable dimensions (FIXTURES.md
Part B). Placeholder for round-1 widening; queries register below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
