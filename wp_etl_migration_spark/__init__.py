"""wp_etl_migration_spark — a PySpark-native ETL/analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the 10up
WordPress ETL framework (``christianc1/wp-etl-migration``, see SURVEY.md):
YAML-configured Extract → Transform → Load pipelines, a column-transform
algebra over prefix-namespaced columns, upsert-style merge sinks with
lookup-before-insert semantics, staged loader chains, and an append-only
ledger — plus LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Everything is declarative DataFrame/Catalyst work: transforms are
``DataFrame -> DataFrame`` functions or ``Column`` expressions so that
predicate pushdown, column pruning and whole-stage codegen apply end to end.
"""

__version__ = "0.1.0"

from wp_etl_migration_spark.session import get_spark  # noqa: F401
