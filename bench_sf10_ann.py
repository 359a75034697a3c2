#!/usr/bin/env python
"""sf10 spot-bench for the batch ANN kernels — the embedding-side
twin of ``bench_sf10_dedup.py``. The incremental ANN loop has a
measured sf0.1→sf1 decade plus an sf1 stationary decomposition
(BASELINE.md §r11/§r12); the BATCH kernels' scaling evidence stopped
at the sf0.1 bench rows. This script runs three scale-critical batch
kernels at 1 / 10 / 100 replicas of the sf0.1 embeddings table
(2k / 20k / 200k vectors) and records walls + per-stage task skew
from the Spark REST API, exactly like the dedup spot-bench.

Corpus: replica 0 is the real table; replicas > 0 are fresh DIVERSE
vectors synthesized per (vec_id, rep, lane) from xxhash64 — the
embedding analog of vocabulary growth (a real corpus 100× bigger has
~100× more distinct vectors, not 100 copies of the same ones), so
bucket occupancy grows with N instead of piling onto the sf0.1
buckets' keys.

Knob policy — THE POINT OF THE BENCH: each kernel's partitioning
knob is sized to the corpus exactly as its docstring prescribes for
production, because that sizing IS the scale claim being tested:

- ``embedding_near_dup_lsh``: planes = 4 + log2(scale), holding
  bucket occupancy ~constant → Σ bucket² grows ~linearly.
  Expected wall exponent ≤ ~1.1 per decade.
- ``ivf_topk``: num_centroids = 64·√scale (the classic C ∝ √N
  rule), cells ~√N vectors; the kernel searches the corpus against
  itself, so total work is N·√N → expected exponent ≤ 1.5. This one
  is SUPPOSED to grow superlinearly — the workload (all-pairs top-k)
  does; the measurement checks the cost model, not flatness.
- ``build+query_ann_index`` (2 tables): a FIXED 2k-query batch
  against the scaled stored index, routing planes sized like the
  near-dup row. Query cost is q·bucket ≈ constant; the index build
  is one linear scan → expected exponent ≤ ~1 for build, ~flat for
  the query wall.

Three kernels, three DIFFERENT documented expectations (≈1, 1.5,
≈0–1): the check is that the measured exponents track the cost
model, not merely that numbers stay small.

In-session repeats are invalid (Spark's cache manager serves
identical plans — measured 4–15× phantom speedups on the dedup twin);
for paired minimums run the script twice and min-merge the JSONs.

Run:  python bench_sf10_ann.py [--scales 1,10,100]
"""

from __future__ import annotations

import json
import math
import os
import sys

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.similarity import (
    build_ann_index, embedding_near_dup_lsh, ivf_topk, query_ann_index)
from wp_etl_migration_spark.session import get_spark

from bench_sf10_dedup import SCRATCH_DIR, SRC, _timed_with_skew

DIMS = 64


def planes_for(n_vectors: int, target_bucket: int = 125) -> list:
    """Occupancy-constant plane count: 2^planes ≈ N / target.
    Full-rank seeded family (operators.similarity.seeded_planes) —
    the first run of this study used the rank-2 sinusoid family and
    measured 22 occupied buckets over 200k vectors (§r12: the rank
    trap this bench exists to catch)."""
    from wp_etl_migration_spark.operators.similarity import seeded_planes
    p = max(4, math.ceil(math.log2(max(n_vectors / target_bucket, 2))))
    return seeded_planes(p, DIMS)


def build_corpus(spark, replicas: int) -> str:
    """sf0.1 embeddings + (replicas-1) hash-synthesized diverse
    replicas; vec_id stride = max(id)+1 (collision-free, r11 ADVICE).
    Lane values for rep > 0 are uniform in [-1, 1] from
    xxhash64(vec_id, rep, lane) — deterministic, no RNG."""
    out = os.path.join(SCRATCH_DIR, f"sf10_embeddings_r{replicas}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    if replicas == 1:
        emb.write.mode("overwrite").parquet(out)
        return out
    stride = emb.agg(F.max("vec_id")).first()[0] + 1
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    synth = F.transform(
        F.col("embedding"),
        lambda _x, i: (F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep"),
                                         i), F.lit(2001))
                       .cast("double") / F.lit(1000.0) - F.lit(1.0))
        .cast("float"))
    (emb.crossJoin(F.broadcast(reps))
     .select((F.col("vec_id") + F.col("rep") * F.lit(stride))
             .alias("vec_id"),
             F.when(F.col("rep") == 0, F.col("embedding"))
             .otherwise(synth).alias("embedding"))
     .repartition(32)
     .write.mode("overwrite").parquet(out))
    return out


def main(argv: list[str]) -> int:
    scales = [int(x) for x in (
        argv[argv.index("--scales") + 1].split(",")
        if "--scales" in argv else ("1", "10", "100"))]
    spark = get_spark("wp-etl-sf10-ann",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark.read.parquet(
        os.path.join(SRC, "embeddings.parquet")) \
        .select("vec_id", "embedding").localCheckpoint(eager=True)
    out = {"metric": "sf10_ann_scaling", "unit": "sec", "scales": {}}
    for r in scales:
        path = build_corpus(spark, r)
        corpus = spark.read.parquet(path).localCheckpoint(eager=True)
        n = corpus.count()
        planes = planes_for(n)
        entry = {"vectors": n, "planes": len(planes), "kernels": {}}

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        # 1) corpus-against-itself near-dup, occupancy-held planes.
        wall, skew = _timed_with_skew(
            spark, lambda: noop(embedding_near_dup_lsh(
                corpus, "vec_id", "embedding", planes=planes,
                threshold=0.3, dims=DIMS)))
        entry["kernels"]["embedding_near_dup_lsh"] = {
            "wall": wall, "worst_skew": skew}

        # 2) IVF all-corpus top-k, C = 64·sqrt(scale).
        c = max(16, int(64 * math.sqrt(r)))
        wall, skew = _timed_with_skew(
            spark, lambda: noop(ivf_topk(
                corpus, "vec_id", "embedding", k=5, num_centroids=c)))
        entry["kernels"]["ivf_topk"] = {
            "wall": wall, "num_centroids": c, "worst_skew": skew}

        # 3) stored-index build + fixed 2k-query batch (2 tables);
        # the second table is an independent full-rank set (seed
        # offset picks disjoint sin-hash lanes).
        from wp_etl_migration_spark.operators.similarity import (
            seeded_planes)
        tables = [planes, seeded_planes(len(planes), DIMS,
                                        seed=7.5311)]
        idx_path = os.path.join(SCRATCH_DIR, f"sf10_ann_idx_r{r}.parquet")
        wall_b, skew_b = _timed_with_skew(
            spark, lambda: build_ann_index(
                corpus, "vec_id", "embedding", tables, tables=2)
            .write.mode("overwrite").parquet(idx_path))
        idx = spark.read.parquet(idx_path)
        wall_q, skew_q = _timed_with_skew(
            spark, lambda: noop(query_ann_index(
                queries, idx, "vec_id", "embedding", tables, k=5,
                tables=2)))
        entry["kernels"]["ann_index_build"] = {
            "wall": wall_b, "worst_skew": skew_b}
        entry["kernels"]["ann_index_query2k"] = {
            "wall": wall_q, "worst_skew": skew_q}
        out["scales"][str(r)] = entry
    kernels = ["embedding_near_dup_lsh", "ivf_topk",
               "ann_index_build", "ann_index_query2k"]
    exps = {}
    for lo, hi in zip(scales, scales[1:]):
        for name in kernels:
            w_lo = out["scales"][str(lo)]["kernels"][name]["wall"]
            w_hi = out["scales"][str(hi)]["kernels"][name]["wall"]
            exps.setdefault(name, {})[f"{lo}->{hi}"] = round(
                math.log10(w_hi / w_lo) / math.log10(hi / lo), 3)
    out["wall_exponents"] = exps
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
