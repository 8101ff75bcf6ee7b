"""LLM-training-data-pipeline queries on ``documents``/``embeddings``
(SURVEY.md §7 Phase 5): dedup, similarity search, text analysis,
multimodal plumbing. Placeholder for round-1 widening; queries register
below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
