#!/usr/bin/env python
"""sf10 spot-bench for the batch dedup kernels (VERDICT r11 #7): one
more decade of scaling evidence for the three scale-critical BATCH
kernels — the incremental stores have a measured sf0.1→sf1 decade
(bench_sf1_soak.py); the batch kernels' evidence stopped at sf1.

Corpus: the bench_sf1_dedup replica recipe at three scales — 1, 10,
and 100 deterministic lightly-perturbed replicas per sf0.1 doc
(5k / 50k / 500k docs). Replicas are true near-dups and every
surviving shingle's document frequency grows with the replica count,
so the superlinear Σ df² candidate term real corpora develop is
present, exactly like the sf1 study. Scratch parquet lives under
.scratch/ (gitignored).

Per (scale, kernel) the script records the wall AND per-stage task
skew (max/median shuffle-read records over every shuffle stage the
kernel ran, from the Spark REST API — the skew bed's metric, here on
the real plans at real scale, no forced-shuffle regime). It prints
one JSON line with walls, per-decade wall exponents
``log10(wall_10x / wall_1x)`` (≤ ~1.15 is the n log n expectation for
a 10× corpus), and the worst stage skew per kernel.

Run:  python bench_sf10_dedup.py [--scales 1,10,100] [--wide]

``--wide`` swaps in the wide-vocabulary corpus (see
:func:`build_corpus`) — the per-shingle df distribution is pinned at
2× the source corpus's at EVERY scale (vocabulary grows instead), so
the ``max_doc_freq`` cap trims a constant fraction and the run
measures the uncapped inverted-index regime the plain replica recipe
stops exercising past sf1 (§r12 honest note 1).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.dedup import (
    dedup_documents, minhash_lsh_pairs, ngram_jaccard_pairs)
from wp_etl_migration_spark.operators.simhash import simhash_near_dup
from wp_etl_migration_spark.queries import JACCARD_MAX_DOC_FREQ
from wp_etl_migration_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".scratch")
MIN_STAGE_RECORDS = 10_000


def build_corpus(spark, replicas: int, wide: bool = False) -> str:
    """The bench_sf1_dedup recipe at an arbitrary replica count;
    replica id stride = max(id)+1 (collision-free for sparse ids,
    r11 ADVICE).

    ``wide=True`` is the WIDE-VOCABULARY variant (§r12 honest note 1:
    the plain recipe saturates every shingle's df at the replica
    count, so by 100 replicas the ``max_doc_freq`` cap excludes most
    of the inverted index and the Jaccard join goes sublinear — the
    cap doing its job, but the uncapped regime stops being measured).
    Here replicas come in PAIRS sharing a salt (salt = rep // 2):
    every word is suffixed ``~{salt}``, so shingles are disjoint
    across salt groups and a shingle's df is 2× its df in the SOURCE
    corpus — a scale-INVARIANT distribution (Heaps-law-style: more
    corpus ⇒ proportionally more vocabulary, not hotter keys). The
    cap therefore trims the same small fraction at every scale and
    the surviving inverted index + candidate join grow with the
    corpus — the uncapped regime. The odd replica of each pair also
    perturbs every 31st word, making the pair true near-dups (3-gram
    Jaccard ≈ (30/31)³ / (2-(30/31)³) ≈ 0.83, above both kernels'
    thresholds)."""
    out = os.path.join(SCRATCH_DIR,
                       f"sf10_documents_{'w' if wide else 'r'}"
                       f"{replicas}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet")) \
        .select("doc_id", "text")
    if replicas == 1 and not wide:
        docs.write.mode("overwrite").parquet(out)
        return out
    stride = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    words = F.split(F.col("text"), r"\s+")
    if wide:
        salt = (F.col("rep") / 2).cast("bigint").cast("string")
        perturbed = F.array_join(
            F.transform(
                words,
                lambda w, i: F.when(
                    ((F.col("rep") % 2) == 1) & ((i % 31) == F.lit(0)),
                    F.concat(F.lit("x~"), salt))
                .otherwise(F.concat(w, F.lit("~"), salt))),
            " ")
    else:
        perturbed = F.array_join(
            F.transform(
                words,
                lambda w, i: F.when(
                    (i % (F.lit(11) + F.col("rep") % 37)) == F.lit(0),
                    F.concat(F.lit("rep"), F.col("rep").cast("string")))
                .otherwise(w)),
            " ")
    keep_raw = F.col("rep") == 0 if not wide else F.lit(False)
    (docs.crossJoin(F.broadcast(reps))
     .select((F.col("doc_id") + F.col("rep") * F.lit(stride))
             .alias("doc_id"),
             F.when(keep_raw, F.col("text"))
             .otherwise(perturbed).alias("text"))
     .repartition(32)
     .write.mode("overwrite").parquet(out))
    return out


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}{path}",
            timeout=60) as r:
        return json.loads(r.read())


def _timed_with_skew(spark, action) -> tuple[float, dict]:
    """(wall seconds, worst-stage skew dict) for one materialized
    plan — max/median shuffle-read records over the new completed
    stages that moved >= MIN_STAGE_RECORDS rows (the skew bed's
    metric on the unmodified production plan)."""
    seen = {(s["stageId"], s["attemptId"])
            for s in _rest(spark, "/stages")}
    t0 = time.monotonic()
    action()
    wall = round(time.monotonic() - t0, 3)
    worst = {"ratio": 0.0}
    for s in _rest(spark, "/stages"):
        if (s["stageId"], s["attemptId"]) in seen \
                or s["status"] != "COMPLETE" \
                or s.get("shuffleReadRecords", 0) < MIN_STAGE_RECORDS:
            continue
        ts = _rest(spark,
                   f"/stages/{s['stageId']}/{s['attemptId']}"
                   "/taskSummary?quantiles=0.0,0.5,1.0")
        _lo, med, hi = ts["shuffleReadMetrics"]["readRecords"]
        # A 0-row median means most reducers of a small-key-count
        # stage sat empty (an AQE coalesce artifact, not a hot key);
        # judge those by max vs the stage's FAIR SHARE instead.
        ratio = (hi / med if med >= 100
                 else hi / (s["shuffleReadRecords"]
                            / max(s["numCompleteTasks"], 1)))
        if ratio > worst["ratio"]:
            worst = {"stage": s["stageId"],
                     "records": s["shuffleReadRecords"],
                     "tasks": s["numCompleteTasks"],
                     "max": hi, "median": med,
                     "ratio": round(ratio, 2)}
    return wall, worst


KERNELS = {
    "ngram_jaccard_dedup":
        lambda d: ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.8,
            max_doc_freq=JACCARD_MAX_DOC_FREQ),
    "minhash_lsh_dedup":
        lambda d: minhash_lsh_pairs(
            d, "doc_id", "text", n=3, num_hashes=16, rows_per_band=2,
            verify_threshold=0.7, max_doc_freq=JACCARD_MAX_DOC_FREQ),
    "dedup_pipeline":
        lambda d: dedup_documents(d, "doc_id", "text"),
    # r13/r14: the fourth batch near-dup kernel (chunk equi-join +
    # packed-word Hamming) at the at-scale configuration.
    # bits=32/chunks=4 (the sf0.1 bench config) is 8-bit chunks = 256
    # bucket values: random occupancy n/256 makes the candidate join
    # quadratic in corpus size — at 500k docs the r14 first attempt
    # sat 27+ min in the candidate stage and was killed. 64-bit
    # signatures (16-bit chunks) fix the WIDTH term, and
    # max_bucket=100 (the JACCARD_MAX_DOC_FREQ discipline) bounds the
    # residual hot buckets this synthetic corpus's 31-word vocabulary
    # concentrates (mass-near-identical signatures — real corpora
    # meet the same regime as boilerplate families). --occupancy
    # measures both terms; the --wide corpus (disjoint per-salt
    # vocabulary) is the uniform-occupancy bed where the cap sits
    # idle.
    "simhash_near_dup":
        lambda d: simhash_near_dup(d, "doc_id", "text", bits=64,
                                   chunks=4, max_bucket=100),
}


def occupancy_probe(spark, corpus) -> dict:
    """Chunk-bucket occupancy stats for 8-bit vs 16-bit chunk widths
    — the quantity that decides whether the simhash candidate join is
    linear or quadratic (expected candidate pairs ≈ Σ_buckets n_b²/2).
    Signatures only + one groupBy: cheap at any scale, no candidate
    join."""
    from wp_etl_migration_spark.operators.simhash import (
        simhash_signatures)
    out = {}
    for bits, chunks in ((32, 4), (64, 4)):
        width = bits // chunks
        sig = simhash_signatures(corpus, "doc_id", "text", bits)
        occ = (sig.select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.substring("simhash", c * width + 1, width)
                     .alias("v")) for c in range(chunks)]))
            .alias("ch"))
            .groupBy("ch").count())
        stats = occ.agg(
            F.count("*").alias("buckets"),
            F.max("count").alias("max_occ"),
            F.avg("count").alias("mean_occ"),
            (F.sum(F.col("count") * F.col("count")) / 2)
            .cast("long").alias("cand_pairs_bound")).first()
        out[f"{bits}b_{width}bit_chunks"] = {
            "buckets": stats["buckets"],
            "max_occupancy": int(stats["max_occ"]),
            "mean_occupancy": round(float(stats["mean_occ"]), 1),
            "candidate_pairs_bound": int(stats["cand_pairs_bound"])}
    return out


def main(argv: list[str]) -> int:
    scales = [int(x) for x in (
        argv[argv.index("--scales") + 1].split(",")
        if "--scales" in argv else ("1", "10", "100"))]
    wide = "--wide" in argv
    # r13: --kernels a,b restricts the run (targeted paired re-runs
    # without re-paying the whole matrix)
    kernels = dict(KERNELS)
    if "--kernels" in argv:
        raw = argv[argv.index("--kernels") + 1]
        # "--kernels none" runs no kernels (occupancy-only probes)
        names = [] if raw == "none" else raw.split(",")
        unknown = set(names) - set(kernels)
        if unknown:
            print(json.dumps({"error": f"unknown kernels "
                                       f"{sorted(unknown)}"}))
            return 2
        kernels = {k: kernels[k] for k in names}
    spark = get_spark("wp-etl-sf10-dedup",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "sf10_dedup_scaling", "unit": "sec",
           "corpus": "wide" if wide else "replica",
           "max_doc_freq": JACCARD_MAX_DOC_FREQ, "scales": {}}
    occupancy = "--occupancy" in argv
    for r in scales:
        path = build_corpus(spark, r, wide=wide)
        corpus = spark.read.parquet(path).localCheckpoint(eager=True)
        entry = {"docs": corpus.count(), "kernels": {}}
        if occupancy:
            entry["simhash_occupancy"] = occupancy_probe(spark, corpus)
        for name, fn in kernels.items():
            # ONE run per kernel per session: in-session repeats are
            # invalid here for the same reason bench.py --paired
            # spawns fresh interpreters — Spark's cache manager
            # serves identical plans from the first run (measured:
            # 4–15× "speedups" on the repeat). For paired minimums,
            # run this script twice and min-merge the JSONs.
            wall, skew = _timed_with_skew(
                spark,
                lambda fn=fn: fn(corpus).write.format("noop")
                .mode("overwrite").save())
            entry["kernels"][name] = {"wall": wall,
                                      "worst_skew": skew}
        out["scales"][str(r)] = entry
    # Per-decade wall exponents: log10(wall at 10x / wall at x).
    exps = {}
    for lo, hi in zip(scales, scales[1:]):
        for name in kernels:
            w_lo = out["scales"][str(lo)]["kernels"][name]["wall"]
            w_hi = out["scales"][str(hi)]["kernels"][name]["wall"]
            exps.setdefault(name, {})[f"{lo}->{hi}"] = round(
                math.log10(w_hi / w_lo)
                / math.log10(hi / lo), 3)
    out["wall_exponents"] = exps
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
