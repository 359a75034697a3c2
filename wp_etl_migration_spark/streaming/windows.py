"""Event-time windowed aggregation over streams.

Shares its aggregation plan with the batch ``event_window_agg`` query
(queries.py) — same groupBy(window(ts), type) — plus the streaming-only
parts: watermark-bounded state and append-mode emission of finalized
windows. At scale the shuffle key is (window, event_type); AQE handles
the per-trigger sizing and state is bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType, TimestampType)

#: Explicit schema — file streams cannot infer (and must not: schema
#: drift on an unbounded source is an error, not a guess).
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source event stream (each new parquet file is a microbatch)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts + sums with late-data bound.

    Watermark trades completeness for bounded state: events later than
    ``watermark`` are dropped; windows finalize (and emit, in append
    mode) once the watermark passes their end.
    """
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "sum_value"))


def run_to_memory(result: DataFrame, table: str,
                  output_mode: str = "append") -> None:
    """Drain all available input into an in-memory table (availableNow —
    the batch-replay trigger used by the tests), then stop."""
    q = (result.writeStream
         .format("memory")
         .queryName(table)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
