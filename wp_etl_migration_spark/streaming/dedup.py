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


def stream_contamination(docs: DataFrame, eval_df: DataFrame,
                         id_col: str, text_col: str,
                         ts_col: str = "ts", n: int = 8,
                         window: str = "1 hour",
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming benchmark-contamination gate: incoming docs sharing ≥1
    word ``n``-gram with the STATIC eval set, as watermarked windowed
    counts (append-mode safe).

    The eval side is a batch frame collapsed to distinct shingles and
    broadcast — a stream-static join is stateless, so the only state is
    the windowed aggregation bounded by the watermark. Returns
    (window_start, id, n_shared); the batch twin is
    ``operators.dedup.contamination``.
    """
    from wp_etl_migration_spark.operators.dedup import shingles
    ev = (shingles(eval_df, id_col, text_col, n, parallelize=False)
          .select("shingle").distinct())
    # Same shingle construction as the batch twin (one definition —
    # operators.dedup.shingles); distinctness is the stream's own
    # watermark-bounded dedup instead of a DISTINCT shuffle.
    sh = (shingles(docs, id_col, text_col, n, parallelize=False,
                   carry_cols=(ts_col,), distinct=False)
          .withWatermark(ts_col, watermark)
          .dropDuplicatesWithinWatermark([id_col, "shingle"]))
    return (sh.join(F.broadcast(ev), on="shingle")
            .groupBy(F.window(ts_col, window).alias("__w"), F.col(id_col))
            .agg(F.count("*").alias("n_shared"))
            .select(F.col("__w.start").alias("window_start"),
                    F.col(id_col), "n_shared"))
