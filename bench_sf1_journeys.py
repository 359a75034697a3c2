#!/usr/bin/env python
"""sf1 scale point for the two composed, write-inclusive journeys
(VERDICT r12 #4): ``wp_post_all`` (legacy CSV → preset chain →
staged WP sinks → ledger) and ``training_prep_all`` (gates → dedup
recipe → packing → shard write → read-back verify) — the two most
expensive headline rows, previously measured only at sf0.1.

Inputs: a derived 10× directory under ``.scratch/sf1_journeys/``
holding the ONLY tables the journeys read —

- ``part.parquet``: 10 replicas, partkey offset by a collision-free
  stride, ``p_name`` suffixed per replica (slugs stay unique so the
  upsert/media semantics scale instead of collapsing onto one slug).
  ``featured_url`` keeps the journey's modulo-500 image space, so
  the media-dedupe hit RATE grows with scale — the hub regime a real
  10× legacy export would show.
- ``documents.parquet``: the bench_sf1_dedup replica recipe (10
  lightly-perturbed near-dup replicas per doc) so the dedup stage
  does genuinely 10× harder clustering work, not 10× disjoint work.

The script runs each journey once at sf0.1 and once at sf1 in one
fresh session (different input paths ⇒ no plan-cache reuse), records
wall + worst per-stage task skew (Spark REST, same metric as the
sf10 rigs) + the journeys' own output contracts (ledger/sink counts;
training_prep's manifest≡read-back assert runs INSIDE the query),
and prints the per-decade wall exponent ``log10(wall_sf1 /
wall_sf0.1)`` — ≤ ~1.15 is the linear-model bound.

Run:  python bench_sf1_journeys.py
"""

from __future__ import annotations

import json
import math
import os
import sys

from pyspark.sql import functions as F

from bench_sf10_dedup import _timed_with_skew
from wp_etl_migration_spark.queries import (
    _wp_post_all_prepare_csv, q_training_prep_all, q_wp_post_all)
from wp_etl_migration_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".scratch")
SF1_DIR = os.path.join(SCRATCH, "sf1_journeys")
REPLICAS = 10


def build_sf1(spark) -> None:
    if os.path.exists(os.path.join(SF1_DIR, "part.parquet",
                                   "_SUCCESS")) and \
            os.path.exists(os.path.join(SF1_DIR, "documents.parquet",
                                        "_SUCCESS")):
        return
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")

    part = spark.read.parquet(os.path.join(SRC, "part.parquet"))
    stride = part.agg(F.max("p_partkey")).first()[0] + 1
    keep = [c for c in part.columns if c not in ("p_partkey", "p_name")]
    (part.crossJoin(F.broadcast(reps))
     .select((F.col("p_partkey") + F.col("rep") * stride)
             .alias("p_partkey"),
             F.when(F.col("rep") == 0, F.col("p_name"))
             .otherwise(F.concat(F.col("p_name"), F.lit(" rep"),
                                 F.col("rep").cast("string")))
             .alias("p_name"),
             *[F.col(c) for c in keep])
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(SF1_DIR, "part.parquet")))

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    dstride = docs.agg(F.max("doc_id")).first()[0] + 1
    dkeep = [c for c in docs.columns if c not in ("doc_id", "text")]
    words = F.split(F.col("text"), r"\s+")
    perturbed = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                (i % (F.lit(11) + F.col("rep") % 37)) == F.lit(0),
                F.concat(F.lit("rep"), F.col("rep").cast("string")))
            .otherwise(w)),
        " ")
    (docs.crossJoin(F.broadcast(reps))
     .select((F.col("doc_id") + F.col("rep") * dstride).alias("doc_id"),
             F.when(F.col("rep") == 0, F.col("text"))
             .otherwise(perturbed).alias("text"),
             *[F.col(c) for c in dkeep])
     .repartition(32)
     .write.mode("overwrite")
     .parquet(os.path.join(SF1_DIR, "documents.parquet")))


def main() -> int:
    spark = get_spark("wp-etl-sf1-journeys",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    out = {"metric": "sf1_journey_scaling", "unit": "sec",
           "replicas": REPLICAS, "scales": {}}
    for tag, sf_dir in (("sf0.1", SRC), ("sf1", SF1_DIR)):
        entry = {}
        # the one-time legacy-CSV fixture is cached scratch, not part
        # of the journey (same exclusion the headline bench makes)
        _wp_post_all_prepare_csv(spark, sf_dir)
        holder = {}
        wall, skew = _timed_with_skew(
            spark, lambda: holder.__setitem__(
                "n", q_wp_post_all(spark, sf_dir).count()))
        run_dir = os.path.join(
            SCRATCH, "wp_post_all_run_" + os.path.basename(sf_dir))
        entry["wp_post_all"] = {
            "wall": wall, "worst_skew": skew,
            "ledger_rows": holder["n"],
            "sinks": {t: spark.read.parquet(
                os.path.join(run_dir, t)).count()
                for t in ("posts", "postmeta", "term_relationships",
                          "attachments")}}
        # output contract: one ledger row per legacy id
        n_part = spark.read.parquet(
            os.path.join(sf_dir, "part.parquet")).count()
        assert holder["n"] == n_part, (holder["n"], n_part)

        holder = {}
        wall, skew = _timed_with_skew(
            spark, lambda: holder.__setitem__(
                "rows", q_training_prep_all(spark, sf_dir).collect()))
        shards = sorted((r.shard, r.n_rows, r.n_tokens)
                        for r in holder["rows"])
        entry["training_prep_all"] = {
            "wall": wall, "worst_skew": skew,
            "n_shards": len(shards),
            "rows": sum(s[1] for s in shards),
            "tokens": sum(s[2] for s in shards)}
        out["scales"][tag] = entry
    exps = {}
    for j in ("wp_post_all", "training_prep_all"):
        exps[j] = round(math.log10(
            out["scales"]["sf1"][j]["wall"]
            / out["scales"]["sf0.1"][j]["wall"]), 3)
    out["wall_exponents"] = exps
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
