"""Sub-coalesce-threshold plan-equivalence guard (VERDICT r5 #5).

The r5 sf1 study found a cogroup whose two sides hashed group keys
with mismatched TYPES: Murmur3 hash partitioning is type-sensitive,
so the same logical key landed in different shuffle partitions and
the cogroup silently paired groups with EMPTY other sides — zero
rows, no error. The bug was invisible at test scale because AQE
coalesced every sf0.01 shuffle down to one partition.

This suite generalizes the fix's regression test into a reusable
guard: every cogroup/equi-join-shaped kernel in the engine runs twice
on force-repartitioned inputs — once under the session defaults, once
with ``spark.sql.shuffle.partitions`` forced high (prime) and AQE
partition coalescing disabled — and must produce row-identical
output. Any relapse of a key-type (or other partitioning-sensitive)
bug reproduces here instead of at the next scale study.

Kernels covered: the grid cogroup (cosine_topk / embedding_near_dup),
the stored-index ANN cogroup (query_ann_index), the MinHash band
join (minhash_lsh_pairs / incremental_lsh_pairs), the shingle
inverted-index join (ngram_jaccard_pairs), the SimHash chunk join,
the FastSS variant join (fuzzy_self_join / fuzzy_join), and the
k-means-cell pair stage (semantic_dedup).
"""

from __future__ import annotations

import random
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

FORCED_PARTS = 97           # prime, far above the default 32

PLANES = [[1.0, -1.0, 0.5, 0.25, -0.25, 0.75, -0.75, 0.1],
          [-0.5, 1.0, -1.0, 0.75, 0.3, -0.2, 0.6, -0.9],
          [0.2, 0.4, -0.6, 0.8, -1.0, 0.1, -0.3, 0.5]]


@contextmanager
def _forced_shuffle(spark):
    """Force high shuffle parallelism and disable AQE coalescing so
    multi-partition shuffles actually happen at test scale."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_coal = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(FORCED_PARTS))
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coal)


def _docs(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        words = [vocab[rng.randrange(30)]
                 for _ in range(rng.randrange(8, 20))]
        rows.append((i, " ".join(words)))
    rows.append((500, rows[3][1]))                 # exact dup
    near = rows[7][1].split()
    near[0] = "w0"
    rows.append((501, " ".join(near)))             # near dup
    return spark.createDataFrame(
        rows, "doc_id long, text string").repartition(16)


def _vecs(spark):
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)])
            for i in range(200)]
    rows += [(1000, rows[5][1]), (1001, rows[5][1])]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(16)


def _k_cosine_topk(spark):
    from wp_etl_migration_spark.operators.similarity import cosine_topk
    emb = _vecs(spark)
    qs = emb.where(F.col("vec_id") % 10 == 0).repartition(8)
    return sorted((r.query_id, r.neighbor_id, r.rank)
                  for r in cosine_topk(emb, "vec_id", "embedding",
                                       k=3, queries=qs).collect())


def _k_embedding_near_dup(spark):
    from wp_etl_migration_spark.operators.similarity import (
        embedding_near_dup)
    emb = _vecs(spark)
    return sorted((r.id_a, r.id_b, round(r.cos_sim, 9)) for r in
                  embedding_near_dup(emb, "vec_id", "embedding",
                                     threshold=0.95).collect())


def _k_query_ann_index(spark):
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, query_ann_index)
    emb = _vecs(spark)
    index = build_ann_index(emb, "vec_id", "embedding",
                            PLANES).repartition(16)
    qs = emb.where(F.col("vec_id") % 7 == 0).repartition(8)
    return sorted((r.query_id, r.neighbor_id, r.rank, round(r.sim, 9))
                  for r in query_ann_index(qs, index, "vec_id",
                                           "embedding", PLANES,
                                           k=3).collect())


def _k_minhash_lsh(spark):
    from wp_etl_migration_spark.operators.dedup import minhash_lsh_pairs
    return sorted((r.id_a, r.id_b, r.agreeing_bands) for r in
                  minhash_lsh_pairs(_docs(spark), "doc_id",
                                    "text").collect())


def _k_incremental_lsh(spark):
    from wp_etl_migration_spark.operators.dedup import (
        incremental_lsh_pairs, lsh_bands)
    d = _docs(spark)
    corpus = d.where(F.col("doc_id") % 3 != 0)
    new = d.where(F.col("doc_id") % 3 == 0).repartition(8)
    bands = lsh_bands(corpus, "doc_id", "text").repartition(16)
    return sorted((r.id_new, r.id_other, r.other_is_new) for r in
                  incremental_lsh_pairs(new, bands, "doc_id",
                                        "text").collect())


def _k_ngram_jaccard(spark):
    from wp_etl_migration_spark.operators.dedup import ngram_jaccard_pairs
    return sorted((r.id_a, r.id_b, r.common, round(r.jaccard, 9))
                  for r in ngram_jaccard_pairs(_docs(spark), "doc_id",
                                               "text", threshold=0.3)
                  .collect())


def _k_simhash(spark):
    from wp_etl_migration_spark.operators.simhash import simhash_near_dup
    return sorted((r.id_a, r.id_b, r.hamming) for r in
                  simhash_near_dup(_docs(spark), "doc_id",
                                   "text").collect())


def _k_fuzzy_self(spark):
    from wp_etl_migration_spark.operators.fuzzy import fuzzy_self_join
    keys = _docs(spark).select(
        "doc_id",
        F.concat(F.lit("k"),
                 (F.col("doc_id") % 40).cast("string")).alias("key"))
    return sorted((r.id_a, r.id_b, r.distance) for r in
                  fuzzy_self_join(keys, "doc_id", "key",
                                  max_distance=1).collect())


def _k_fuzzy_join(spark):
    from wp_etl_migration_spark.operators.fuzzy import fuzzy_join
    d = _docs(spark)
    left = d.select(F.col("doc_id").alias("lid"),
                    F.concat(F.lit("key"), (F.col("doc_id") % 50)
                             .cast("string")).alias("lkey"))
    right = d.select(F.col("doc_id").alias("rid"),
                     F.concat(F.lit("kee"), (F.col("doc_id") % 50)
                              .cast("string")).alias("rkey")) \
        .where(F.col("rid") < 60).repartition(8)
    return sorted((r.lid, r.rid, r.distance) for r in
                  fuzzy_join(left, right, "lid", "lkey", "rid",
                             "rkey", max_distance=1).collect())


def _k_cap_per_key(spark):
    # two-phase top-n (r6): the (key, id-hash-bucket) phase-1 window
    # plus the per-key phase-2 window must agree on the kept set at
    # any shuffle partitioning
    from wp_etl_migration_spark.operators.sampling import cap_per_key
    d = _docs(spark).select(
        "doc_id",
        F.concat(F.lit("dom"),
                 (F.col("doc_id") % 7).cast("string")).alias("source"))
    return sorted((r.doc_id, r.source) for r in
                  cap_per_key(d, "doc_id", "source", max_per_key=5,
                              salt="eq|").collect())


def _k_semantic_dedup(spark):
    from wp_etl_migration_spark.operators.similarity import semantic_dedup
    emb = _vecs(spark)
    return sorted(r.vec_id for r in
                  semantic_dedup(emb, "vec_id", "embedding", k=8,
                                 iters=1, threshold=0.95).collect())


KERNELS = {
    "cosine_topk": _k_cosine_topk,
    "embedding_near_dup": _k_embedding_near_dup,
    "query_ann_index": _k_query_ann_index,
    "minhash_lsh_pairs": _k_minhash_lsh,
    "incremental_lsh_pairs": _k_incremental_lsh,
    "ngram_jaccard_pairs": _k_ngram_jaccard,
    "simhash_near_dup": _k_simhash,
    "fuzzy_self_join": _k_fuzzy_self,
    "fuzzy_join": _k_fuzzy_join,
    "cap_per_key": _k_cap_per_key,
    "semantic_dedup": _k_semantic_dedup,
}


@pytest.mark.parametrize("name", sorted(KERNELS))
def test_kernel_output_stable_under_forced_shuffle(spark, name):
    base = KERNELS[name](spark)
    assert base, f"{name}: default-config run produced no rows"
    with _forced_shuffle(spark):
        forced = KERNELS[name](spark)
    assert forced == base, (
        f"{name}: output differs between default shuffle config and "
        f"{FORCED_PARTS} partitions with AQE coalescing off — a "
        "partitioning-sensitive (e.g. key-type) bug")
