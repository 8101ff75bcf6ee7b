"""Statistical / ML queries (SURVEY.md §2.10): correlation matrix, Granger
causality, per-group recursive forecasting. Placeholder for round-1
widening; queries register below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
