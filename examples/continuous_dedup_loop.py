#!/usr/bin/env python
"""Continuous corpus maintenance — the streaming production loop that
keeps a growing crawl duplicate-free, composed from the engine's
incremental stores (``streaming/incremental.py``):

    crawl batches ──► IncrementalDedup.process_batch
        exact pass   (stored digest index — corpus text never re-read)
        near-dup pass(stored LSH band index — corpus never re-shingled)
        survivors    → corpus/ + index tail partitions (replay-safe)
        auto-compact (end of batch): once the tail exceeds
            auto_compact_tail partitions, the committed tails fold
            into the sub-bucketed base (atomic versioned-pointer
            flip); later probes prune to their own key sub-buckets
    takedowns ──► delete(ids, batch_id): tombstoned out of every
        probe immediately, physically purged as compaction rewrites
        runs; corpus() reads the live (masked) corpus
    parallel ──► IncrementalAnnIndex (embedding twin): each batch is
        scored against the stored int8 index (multi-probe recall
        lever), then indexed for the batches after it

Run:  python examples/continuous_dedup_loop.py [sf_dir] [store_dir]

The same ``process_batch`` body attaches to a real stream via
``run_stream`` (foreachBatch + checkpoint = exactly-once store state);
this example drives it in backfill mode so it completes in seconds on
the test data. Compaction is automatic and serialized with the batch
body; ``auto_compact_tail`` is the one operational knob — fold often
enough that the unfolded tail stays a small fraction of the base
(here 2 partitions so the demo folds visibly; at 100 TB whatever
keeps the tail under a few hundred partitions).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.similarity import seeded_planes
from wp_etl_migration_spark.session import get_spark
from wp_etl_migration_spark.streaming.incremental import (
    IncrementalAnnIndex, IncrementalDedup)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store_root = sys.argv[2] if len(sys.argv) > 2 \
        else tempfile.mkdtemp(prefix="continuous_dedup_")
    shutil.rmtree(store_root, ignore_errors=True)

    spark = get_spark("continuous-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text").localCheckpoint(eager=True)
    n = docs.count()

    # --- text loop: 6 batches; ~20% of each repeats earlier content ---
    loop = IncrementalDedup(spark, os.path.join(store_root, "dedup"),
                            "doc_id", "text", max_bucket=64,
                            auto_compact_tail=2)
    for b in range(6):
        batch = docs.select(
            (F.col("doc_id") + b * n).alias("doc_id"),
            F.when(F.col("doc_id") % 5 == 0, F.col("text"))   # dup of b0
            .otherwise(F.regexp_replace(F.col("text"), " ",
                                        f" w{b} ")).alias("text"))
        loop.process_batch(batch, b)   # auto-compacts when tail > 2
        corpus_rows = loop.corpus().count()
        ptr = loop._band_store.pointer()
        runs = (ptr or {}).get("runs", [])
        auto = (ptr or {}).get("auto")
        print(f"batch {b}: corpus={corpus_rows}"
              + (" base=" + "+".join(
                  f"gen-{r['gen']}(subs={r['num_subs']})"
                  for r in runs) if runs else " base=<tail only>")
              + (f" auto-compacted@{auto['at_batch']}" if auto else ""))

    # --- takedown: tombstone two docs, show the live corpus shrink,
    #     then re-ingest one of them at a later batch (re-admitted) ---
    unique = spark.createDataFrame(
        [(990001, "takedown demo document with entirely unique "
                  "wording shared by no crawl batch")],
        ["doc_id", "text"])
    loop.process_batch(unique, 6)
    before = loop.corpus().count()
    loop.delete([990001], 7)
    print(f"deleted [990001]: corpus {before} -> "
          f"{loop.corpus().count()} (masked immediately; purged as "
          "compaction rewrites runs)")
    loop.process_batch(unique, 8)   # same content, later batch
    print(f"re-ingested 990001 at batch 8: "
          f"corpus={loop.corpus().count()} (re-admitted — its "
          "tombstone scopes to batches <= 7)")
    # physical purge: the deleted copy's BYTES leave the corpus store
    # (the re-ingested batch-8 copy is out of the tombstone's scope
    # and survives the rewrite untouched)
    purged = loop.purge_corpus()
    print(f"purge_corpus: rewrote {purged['partitions_rewritten']} "
          f"partition(s), {purged['rows_purged']} row(s) gone from "
          f"disk, {purged['tombs_retired']} tombstone record(s) "
          f"retired; corpus={loop.corpus().count()} (unchanged)")

    # --- embedding twin: each batch scored against all earlier ones ---
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")) \
        .select("vec_id", "embedding").localCheckpoint(eager=True)
    m = emb.count()
    dims = len(emb.first().embedding)
    # seeded_planes, NOT a hand-rolled sin(a + p*b + i*c) family —
    # that construction is rank 2 (every plane in one 2-D span, so 8
    # "planes" cut ≤16 of the nominal 256 buckets; the r12 trap,
    # operators/similarity.seeded_planes docstring)
    planes = seeded_planes(8, dims)
    ann = IncrementalAnnIndex(spark, os.path.join(store_root, "ann"),
                              "vec_id", "embedding", planes, k=3,
                              n_probes=2, auto_compact_tail=2)
    for b in range(3):
        batch = emb.select(
            (F.col("vec_id") + b * m).alias("vec_id"),
            F.transform(F.col("embedding").cast("array<double>"),
                        lambda x, i: x + 0.01 * F.sin(
                            2.0 * F.lit(float(b))
                            + 0.3 * i.cast("double"))).alias("embedding"))
        ann.process_batch(batch, b)
    matches = spark.read.parquet(f"{store_root}/ann/matches").count()
    print(f"ann matches: {matches} rows across "
          f"{3 * m} vectors (strictly backward, no self-matches)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
