#!/usr/bin/env python
"""sf10 spot-bench for the ITERATIVE graph kernels (VERDICT r12 #3):
``connected_components`` (the dedup_clusters row's kernel) and
``pagerank`` — both top-8 wall rows, both round-based shuffle
kernels, and both previously evidenced only at sf0.1.

Inputs scale 1 / 10 / 100 with PRODUCTION-SHAPED structure, not
uniform noise:

- **CC**: near-dup clustering at corpus scale grows the NUMBER of
  clusters, not their size, so the rig fixes the component-size mix
  (30k size-2 + 8k size-5 + 2k size-20 star components per unit,
  near-dup-cluster-like) and a constant diameter tail (20 chains of
  512 nodes per unit — the worst case pointer jumping must halve;
  rounds stay ~log2(512) at EVERY scale, so the wall expectation is
  linear in edges × a constant round count). ~150k nodes / ~110k
  edges per unit → ~15M nodes / ~11M edges at scale 100.
- **PageRank**: the driver row's customer↔supplier graph with
  replicated CUSTOMERS and SHARED suppliers — each replica offsets
  the customer ids but keeps the supplier side, so edge volume grows
  ×R while supplier-hub degree ALSO grows ×R, exactly the
  hot-aggregation regime the kernel's map-side-combine claim is
  about (a disjoint-subgraph replica would scale volume but never
  grow a hub). 3 power steps, undirected, like the driver row.

Per (scale, kernel): wall + worst per-stage task skew
(max/median shuffle-read records, Spark REST — the skew bed's metric
on the unmodified production plans), then per-decade wall exponents
``log(wall_hi/wall_lo) / log(hi/lo)``; ≤ ~1.15 is the
n log n · constant-rounds expectation.

Run:  python bench_sf10_graph.py [--scales 1,10,100]

ONE run per kernel per session (in-session repeats are plan-cache
contaminated — see bench_sf10_dedup); paired minimums come from
running the script twice and min-merging the JSON lines.
"""

from __future__ import annotations

import json
import math
import os
import sys

from pyspark.sql import functions as F

from bench_sf10_dedup import _timed_with_skew
from wp_etl_migration_spark.operators.graph import (
    connected_components, pagerank)
from wp_etl_migration_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: node-id slot per star component (> max star size 20)
SLOT = 32
#: chain node ids live far above every star id at any scale
CHAIN_BASE = 2 ** 40
CHAIN_LEN = 512
CLUSTERS_PER_UNIT = 40_000
CHAINS_PER_UNIT = 20


def cc_edges(spark, scale: int):
    """Deterministic production-shaped component mix (see module
    docstring): star components in a fixed 30/8/2 size-2/5/20 ratio
    plus constant-length chains. Pure ``spark.range`` arithmetic —
    no RNG, no source table."""
    c = spark.range(CLUSTERS_PER_UNIT * scale)
    size = (F.when(F.col("id") % 40 < 30, 2)
            .when(F.col("id") % 40 < 38, 5)
            .otherwise(20))
    stars = (c.select(F.col("id").alias("comp"), size.alias("size"))
             .select("comp",
                     F.explode(F.sequence(F.lit(1),
                                          F.col("size") - 1)).alias("j"))
             .select((F.col("comp") * SLOT).alias("id_a"),
                     (F.col("comp") * SLOT + F.col("j")).alias("id_b")))
    k = spark.range(CHAINS_PER_UNIT * scale)
    chains = (k.select(F.col("id").alias("k"),
                       F.explode(F.sequence(
                           F.lit(0), F.lit(CHAIN_LEN - 2))).alias("p"))
              .select((F.lit(CHAIN_BASE) + F.col("k") * CHAIN_LEN
                       + F.col("p")).alias("id_a"),
                      (F.lit(CHAIN_BASE) + F.col("k") * CHAIN_LEN
                       + F.col("p") + 1).alias("id_b")))
    return (stars.unionByName(chains)
            .repartition(32).localCheckpoint(eager=True))


def pr_edges(spark, scale: int):
    """The q_pagerank graph with ×scale customers sharing ONE
    supplier side: replica r offsets customer ids by r·stride, the
    supplier node range is common — hub in-degree grows with scale
    (see module docstring)."""
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    base = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .select(F.col("o_custkey").alias("cust"),
                    F.col("l_suppkey").alias("supp"))
            .distinct())
    stride = base.agg(F.max("cust")).first()[0] + 1
    reps = spark.range(scale).withColumnRenamed("id", "rep")
    return (base.crossJoin(F.broadcast(reps))
            .select((F.col("cust") + F.col("rep") * stride)
                    .alias("src"),
                    (F.col("supp") + 1_000_000).alias("dst"))
            .repartition(32).localCheckpoint(eager=True))


def main(argv: list[str]) -> int:
    scales = [int(x) for x in (
        argv[argv.index("--scales") + 1].split(",")
        if "--scales" in argv else ("1", "10", "100"))]
    spark = get_spark("wp-etl-sf10-graph",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "sf10_graph_scaling", "unit": "sec", "scales": {}}
    for s in scales:
        entry = {"kernels": {}}
        edges = cc_edges(spark, s)
        entry["cc_edges"] = edges.count()
        wall, skew = _timed_with_skew(
            spark,
            lambda: connected_components(edges)
            .write.format("noop").mode("overwrite").save())
        entry["kernels"]["dedup_clusters_cc"] = {"wall": wall,
                                                 "worst_skew": skew}
        if s == scales[0]:
            # structural spot-check once, at the cheap scale: every
            # planted component resolves to one label
            n_comp = (connected_components(edges)
                      .select("component").distinct().count())
            assert n_comp == (CLUSTERS_PER_UNIT + CHAINS_PER_UNIT) * s, \
                n_comp
        edges.unpersist()

        pedges = pr_edges(spark, s)
        entry["pr_edges"] = pedges.count()
        wall, skew = _timed_with_skew(
            spark,
            lambda: pagerank(pedges, iterations=3, undirected=True)
            .write.format("noop").mode("overwrite").save())
        entry["kernels"]["pagerank"] = {"wall": wall,
                                        "worst_skew": skew}
        pedges.unpersist()
        out["scales"][str(s)] = entry
    exps = {}
    for lo, hi in zip(scales, scales[1:]):
        for name in ("dedup_clusters_cc", "pagerank"):
            w_lo = out["scales"][str(lo)]["kernels"][name]["wall"]
            w_hi = out["scales"][str(hi)]["kernels"][name]["wall"]
            exps.setdefault(name, {})[f"{lo}->{hi}"] = round(
                math.log10(w_hi / w_lo) / math.log10(hi / lo), 3)
    out["wall_exponents"] = exps
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
