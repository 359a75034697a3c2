"""Sequence packing for training-data preparation (LLM-pipeline
extension; no counterpart in the reference).

Training pipelines pack documents into fixed token-budget sequences
(e.g. 4096-token windows). The greedy contiguous policy — lay documents
out in a deterministic order and cut every ``seq_len`` tokens — needs a
GLOBAL prefix sum over token counts, which naively means one partition.
Spark-first it is the classic two-phase distributed scan, the same
shape as the engine's ID assignment (sinks/wordpress.assign_new_ids):

1. range-partition by the order key and cumsum within partitions
   (a per-partition window — parallel, no global sort bottleneck);
2. collect the ~numPartitions partition totals (bytes, not data) and
   turn them into per-partition prefix offsets;
3. global_cumsum = partition_prefix + within_partition_cumsum.

The input is pinned with an eager localCheckpoint before step 2 so the
offsets job and the output read one materialization (nondeterministic
upstream plans cannot shift rows between partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   seq_len: int,
                   order_col: str | None = None) -> DataFrame:
    """Assign each doc a bin and offset under greedy contiguous packing.

    Docs are laid out in ``order_col`` order (default: ``id_col``) and
    cut into ``seq_len``-token bins. Output columns: ``id_col``,
    ``bin_id`` (the bin the doc STARTS in), ``bin_offset`` (token
    offset of the doc inside that bin), ``n_tokens``. A doc longer than
    the remaining space spans into following bins, exactly like the
    concat-then-chunk tokenizer layout it models.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    order = order_col or id_col
    # NULL token counts (empty/unparsed docs) pack as zero-length — they
    # get a position but consume no budget; a None would otherwise kill
    # the prefix-sum arithmetic driver-side.
    from wp_etl_migration_spark.operators.checkpoint import pin

    ordered = pin(df.select(F.col(id_col),
                            F.coalesce(F.col(tokens_col).cast("long"),
                                       F.lit(0)).alias("__n"),
                            F.col(order).alias("__ord"))
                  .repartitionByRange("__ord")
                  .sortWithinPartitions("__ord")
                  .withColumn("__pid", F.spark_partition_id()))

    part_totals = dict(ordered.groupBy("__pid")
                       .agg(F.sum("__n").alias("s"))
                       .select("__pid", "s").collect())
    offsets, acc = {}, 0
    for pid in sorted(part_totals):
        offsets[pid] = acc
        acc += part_totals[pid]
    prefix = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])

    w = (Window.partitionBy("__pid").orderBy("__ord")
         .rowsBetween(Window.unboundedPreceding, -1))
    before = (F.coalesce(F.sum("__n").over(w), F.lit(0))
              + prefix[F.col("__pid")])
    # Integer `div`, not float `/`: past 2^53 cumulative tokens a double
    # division rounds and assigns wrong bins.
    return (ordered.withColumn("__before", before)
            .select(
                F.col(id_col),
                F.expr(f"__before div {seq_len}").alias("bin_id"),
                (F.col("__before") % seq_len).alias("bin_offset"),
                F.col("__n").alias("n_tokens")))
