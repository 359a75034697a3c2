#!/usr/bin/env python
"""Shared deterministic scratch-corpus builder for the sf1 bench rigs.

Why this exists (VERDICT r7 "Next round" #2): the synthetic sf0.1
``documents`` table draws from a pool of only **31 distinct words**, so
every text-heavy measurement on the raw table (vocabulary build, LM
training/scoring, BPE, keyword extraction) exercises a vocabulary three
orders of magnitude smaller than real crawl text — token-count shapes
are right, but hash-key cardinality, shuffle width, and per-key
frequency distributions are not. The individual rigs each grew an ad
hoc "replica-suffix" diversifier; this module is that trick, once,
deterministic, and fingerprint-cached.

The derived corpus: ``replicas`` copies of the sf0.1 ``documents``
table, with every word in replica ``r`` suffixed ``~r<r>`` — base
vocabulary × replicas distinct words (31 → ~1k at 32 replicas, ~3k at
100), per-word frequencies still in the thousands (realistic Zipf-ish
head), doc count × replicas. Knobs:

- ``replicas``: corpus multiplier (and vocabulary multiplier).
- ``boiler_every``: if set, every Nth doc (by source doc_id) gets a
  shared boilerplate line prepended — the cross-document duplicate
  structure ``line_dedup`` exists to remove. The boilerplate is NOT
  replica-suffixed, so it is genuinely corpus-global, like a real
  newsletter footer.

doc_ids are fresh surrogates (``monotonically_increasing_id``) — the
obvious ``doc_id + rep * n`` remap is only collision-free for ids dense
in [0, n), which the generator does not promise.

The cache path fingerprints every knob (the r6 advisory's fixture-cache
lesson: a bare ``_SUCCESS`` probe under a fixed name serves a stale
corpus after a parameter edit). Scratch parquet lives under
``.scratch/`` (gitignored); testdata is never written.
"""

from __future__ import annotations

import os

BOILER = "subscribe to our newsletter for daily updates and offers"
_ROOT = os.path.dirname(os.path.abspath(__file__))


def diversified_corpus(spark, *, replicas: int,
                       sf_dir: str | None = None,
                       boiler_every: int | None = None,
                       cpus: int | None = None) -> str:
    """Build (or reuse) the diversified corpus; returns the parquet
    path. Columns: ``doc_id`` (fresh long surrogate), ``text``."""
    from pyspark.sql import functions as F

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR",
                                      "/root/testdata/sf0.1")
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = f"r{replicas}_b{boiler_every or 0}_{os.path.basename(os.path.normpath(sf_dir))}"
    scratch = os.path.join(_ROOT, ".scratch",
                           f"diverse_docs_{tag}.parquet")
    if os.path.exists(os.path.join(scratch, "_SUCCESS")):
        return scratch

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id",
                                                          "text")
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    suffixed = F.regexp_replace(
        F.col("text"), r"(\S+)",
        F.concat(F.lit("$1~r"), F.col("rep").cast("string")))
    text = suffixed
    if boiler_every:
        text = F.concat(
            F.when(F.col("doc_id") % boiler_every == 0,
                   F.lit(BOILER + " | ")).otherwise(F.lit("")),
            suffixed)
    (docs.crossJoin(F.broadcast(reps))
     .select(F.monotonically_increasing_id().alias("doc_id"),
             text.alias("text"))
     .repartition(cpus)
     .write.mode("overwrite").parquet(scratch))
    return scratch
