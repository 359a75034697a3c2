#!/usr/bin/env python
"""sf1 spot-bench for the dedup family: empirically demonstrate the
exact-Jaccard vs MinHash-LSH crossover documented in BASELINE.md.

At sf0.1 (5k docs) the exact inverted-index path beats LSH because LSH
does strictly more work (signatures + banding + verify) while the
quadratic Σ df² term it exists to avoid is still negligible. The
crossover arrives when shingle document frequency grows with corpus
size. This script builds a derived ~10× corpus ("sf1-equivalent",
50k docs) from the committed sf0.1 documents table — 10 deterministic
replicas per doc, each replica's text lightly perturbed (every
(11+r)-th word replaced by a replica token) so replicas are true
near-dups and every surviving shingle's document frequency scales ~10×,
making Σ df² grow ~100× while the corpus grows 10× — the superlinear
regime real corpora enter. Both operators then run with the SAME
hot-shingle cap the registry queries use.

Scratch parquet lives under .scratch/ (gitignored); testdata is never
modified. Prints one JSON line with both timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.dedup import (
    minhash_lsh_pairs, ngram_jaccard_pairs)
from wp_etl_migration_spark.queries import JACCARD_MAX_DOC_FREQ
from wp_etl_migration_spark.session import get_spark

REPLICAS = 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".scratch", "sf1_documents.parquet")


def build_corpus(spark) -> None:
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet")) \
        .select("doc_id", "text")
    n_docs = docs.count()
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    # Replica r: doc_id offset by r*n_docs; every (11+r)-th word swapped
    # for a replica token => pairwise Jaccard across replicas stays high
    # (near-dups) while each replica contributes its own shingles to the
    # shared document-frequency pool.
    words = F.split(F.col("text"), r"\s+")
    perturbed = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                (i % (F.lit(11) + F.col("rep"))) == F.lit(0),
                F.concat(F.lit("rep"), F.col("rep").cast("string")))
            .otherwise(w)),
        " ")
    big = (docs.crossJoin(F.broadcast(reps))
           .select((F.col("doc_id") + F.col("rep") * F.lit(n_docs))
                   .alias("doc_id"),
                   F.when(F.col("rep") == 0, F.col("text"))
                   .otherwise(perturbed).alias("text")))
    big.write.mode("overwrite").parquet(SCRATCH)


def main() -> int:
    # 50k docs × ~16 shingle+signature passes: size the single local JVM
    # like a real executor instead of the 1g driver default.
    spark = get_spark("wp-etl-sf1-dedup",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)
    corpus = spark.read.parquet(SCRATCH)
    n = corpus.count()

    from wp_etl_migration_spark.operators.dedup import line_dedup
    from wp_etl_migration_spark.operators.textstats import (
        remove_shared_passages)

    timings = {}
    for name, fn in (
        ("ngram_jaccard_dedup",
         lambda d: ngram_jaccard_pairs(
             d, "doc_id", "text", n=3, threshold=0.8,
             max_doc_freq=JACCARD_MAX_DOC_FREQ)),
        ("minhash_lsh_dedup",
         lambda d: minhash_lsh_pairs(
             d, "doc_id", "text", n=3, num_hashes=16, rows_per_band=2,
             verify_threshold=0.7, max_doc_freq=JACCARD_MAX_DOC_FREQ)),
        # r4 text-rewrite ops: no pair join in either plan, so both
        # should scale ~linearly with the corpus (vs the superlinear
        # pair-generating family above).
        ("passage_removal",
         lambda d: remove_shared_passages(d, "doc_id", "text", k=8)),
        ("line_dedup",
         lambda d: line_dedup(d, "doc_id", "text", max_line_df=3,
                              delimiter=" table ")),
    ):
        start = time.monotonic()
        fn(corpus).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - start, 3)

    print(json.dumps({
        "metric": "sf1_dedup_crossover", "unit": "sec",
        "docs": n, "replicas": REPLICAS,
        "max_doc_freq": JACCARD_MAX_DOC_FREQ,
        "queries": timings,
        "lsh_speedup_vs_exact": round(
            timings["ngram_jaccard_dedup"]
            / timings["minhash_lsh_dedup"], 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
