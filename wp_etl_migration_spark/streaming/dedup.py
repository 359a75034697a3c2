"""Streaming deduplication.

The batch dedup operators (``operators.dedup``) re-expressed over
unbounded input: exact dedup by key or content digest with
watermark-bounded state (``dropDuplicatesWithinWatermark`` — state holds
one entry per key only for the watermark horizon, so it cannot grow
unboundedly the way plain ``dropDuplicates`` state does on a stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_keys(events: DataFrame, keys: list[str],
                      ts_col: str = "ts",
                      watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon."""
    return (events
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def stream_dedup_content(events: DataFrame, content_cols: list[str],
                         ts_col: str = "ts",
                         watermark: str = "2 hours") -> DataFrame:
    """Exact content dedup on a stream: digest the content columns (the
    batch ``exact_dedup`` key) and dedupe on the digest."""
    digest = F.md5(F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in content_cols]))
    return (events
            .withColumn("__digest", digest)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__digest"])
            .drop("__digest"))
