"""In-memory source (SURVEY §2.1 S9).

≙ ``from_array($rows)`` (Extract Orchestrator.php:222-223) — build a
DataFrame from driver-side rows. Used for config-driven literal inputs and
tests; never for data-plane volumes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def from_rows(spark: SparkSession, rows: Sequence[dict],
              schema=None) -> DataFrame:
    """Create a DataFrame from a list of dicts (schema inferred unless
    given)."""
    return spark.createDataFrame(rows, schema=schema)
