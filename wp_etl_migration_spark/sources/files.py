"""File-format scans (SURVEY §2.1 S1–S3).

Thin, explicit wrappers over ``spark.read`` so YAML job configs map 1:1
onto reader options while Catalyst keeps predicate pushdown / column
pruning / partition planning (the reference's Finder + adapter factory,
Extract AdapterFactory.php:63-169, collapses to this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_csv(spark: SparkSession, path: str, header: bool = True,
             infer_schema: bool = True, **options) -> DataFrame:
    """CSV scan ≙ ``from_csv(path)`` (adapter: csv)."""
    reader = (spark.read
              .option("header", str(header).lower())
              .option("inferSchema", str(infer_schema).lower()))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def from_json(spark: SparkSession, path: str, multi_line: bool = False,
              **options) -> DataFrame:
    """JSON scan ≙ ``from_json(path)`` (adapter: json). JSONL by default;
    ``multi_line=True`` for a top-level array document."""
    reader = spark.read.option("multiLine", str(multi_line).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def from_xml(spark: SparkSession, path: str, row_tag: str,
             **options) -> DataFrame:
    """XML scan ≙ ``from_xml(path)->withXMLNodePath('rss/channel/item')``.

    Spark 4 ships the XML source natively; ``row_tag`` is the repeating
    node (the last path segment of the reference's node path).
    """
    reader = spark.read.option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.xml(path)


def from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the engine's canonical columnar input."""
    return spark.read.parquet(path)
