"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`wp_etl_migration_spark.queries` — the engine's query
registry. Each registry entry pairs a PySpark callable with an equivalent
DuckDB oracle SQL string; see SURVEY.md §2 for the operator inventory each
query covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wp_etl_migration_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on /root/testdata/sf0.001."""
    return _q.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
