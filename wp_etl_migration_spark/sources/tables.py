"""Canonical access to the synthetic warehouse tables (TESTDATA.md).

``Tables`` is a tiny facade so query code reads declaratively
(``t.lineitem()``, ``t.orders()``) and every scan goes through one place —
the hook for future bucketing / path-template / catalog decisions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "documents", "embeddings")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one warehouse table from ``sf_dir``.

    ``events.ts`` has shipped in two parquet encodings; normalize both:

    * TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong`` it
      surfaces as a long we convert via exact integer division
      (``div 1000`` — double division would lose microseconds at 1e18 ns
      magnitudes).
    * ``timestamp[us]`` with no timezone: Spark 4 infers TIMESTAMP_NTZ,
      which ``F.unix_micros`` & friends reject. The session timezone is
      pinned UTC (session.tune), so casting to TIMESTAMP is lossless and
      agrees with the DuckDB oracle.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtypes.get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class Tables:
    """Facade: ``Tables(spark, sf_dir).lineitem()`` etc."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str):
        if name in TABLE_NAMES:
            return lambda: load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)
