#!/usr/bin/env python
"""sf1 spot-bench for the embedding family — the ANN twin of
``bench_sf1_dedup.py``: stored quantized index (`build_ann_index` +
`query_ann_index`) vs brute-force `cosine_topk`, plus `semantic_dedup`,
on a derived 50k-vector corpus, with the ANN path's recall@5 against
the brute-force ground truth.

Corpus: 25 deterministic replicas of the committed sf0.1 embeddings
table (2 000 × 64-dim), each replica's vector perturbed by a small
per-dim deterministic offset so replicas are TRUE near-neighbors (the
workload ANN exists for) while inter-family similarity stays random.
Scratch parquet lives under .scratch/ (gitignored); testdata is never
modified.

Methodology (BASELINE.md round-4 robustness note): in-session repeats
are invalid for operators that ``.cache()``, and single cold runs vary
±50% — so ``--study`` spawns THREE COLD SESSIONS per operator (fresh
interpreter + JVM each, alternating operator order) and reports
per-operator min/median. ``--op NAME`` runs one operator in this
process (the child mode); ``--recall`` computes recall@5 (a result,
not a timing — one session is fine).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

REPLICAS = 25
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".scratch", "sf1_embeddings.parquet")
IDX_STORE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".scratch", "sf1_ann_index.parquet")
K = 5
#: Seeded hyperplanes (full-rank sin-hash family, r12 — the rank-2
#: sinusoid set this replaces gave ≤16 effective buckets, not 256;
#: see operators.similarity.seeded_planes): 8 planes → 256 buckets →
#: balanced Σb² ≈ 50k²/256 ≈ 10M in-bucket pairs, ~250× under brute
#: force's 2.5G — now actually true.
PLANES = __import__(
    "wp_etl_migration_spark.operators.similarity",
    fromlist=["seeded_planes"]).seeded_planes(8, 64)


def plane_tables(t: int) -> list:
    """T independent seeded 8-plane sets (full-rank sin-hash family,
    r12 — the phase-shifted sinusoids this replaces were ALL in one
    2-D span across every table and plane: rank 2 total, so extra
    tables probed near-identical cuts; see
    operators.similarity.seeded_planes)."""
    from wp_etl_migration_spark.operators.similarity import (
        seeded_planes)
    return [seeded_planes(8, 64, seed=12.9898 + tt * 4.7113)
            for tt in range(t)]


def build_corpus(spark) -> None:
    if os.path.exists(os.path.join(SCRATCH, "_SUCCESS")):
        return
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    n = emb.count()
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    # Replica r of vector v: v + 0.02·sin(3r + 0.5i) per dim — a small
    # deterministic rotation-ish offset; replicas of one base vector
    # stay ~0.98+ cosine to each other, far above random pairs.
    perturbed = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: x + 0.02 * F.sin(3.0 * F.col("rep")
                                      + 0.5 * i.cast("double")))
    big = (emb.crossJoin(F.broadcast(reps))
           .select((F.col("vec_id") + F.col("rep") * F.lit(n))
                   .alias("vec_id"),
                   F.when(F.col("rep") == 0,
                          F.col("embedding").cast("array<double>"))
                   .otherwise(perturbed).alias("embedding")))
    big.write.mode("overwrite").parquet(SCRATCH)


def build_index_store(spark) -> None:
    """Prebuild the stored int8 index once (untimed prep): the
    incremental scenario measures QUERYING a store that already
    exists, like a production corpus snapshot."""
    if os.path.exists(os.path.join(IDX_STORE, "_SUCCESS")):
        return
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index)
    corpus = spark.read.parquet(SCRATCH)
    build_ann_index(corpus, "vec_id", "embedding", PLANES) \
        .write.mode("overwrite").parquet(IDX_STORE)


def _spark():
    from wp_etl_migration_spark.session import get_spark
    spark = get_spark("wp-etl-sf1-emb",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_op(name: str) -> float:
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, cosine_topk, query_ann_index, semantic_dedup)
    spark = _spark()
    build_corpus(spark)
    build_index_store(spark)
    corpus = spark.read.parquet(SCRATCH)
    # The incremental batch: one query per replica family (2k rows).
    batch = corpus.where(F.col("vec_id") % REPLICAS == 0)
    start = time.monotonic()
    if name == "cosine_topk_self":
        out = cosine_topk(corpus, "vec_id", "embedding", k=K)
    elif name == "ann_index_self":
        idx = build_ann_index(corpus, "vec_id", "embedding", PLANES)
        out = query_ann_index(corpus, idx, "vec_id", "embedding",
                              PLANES, k=K, rescore="arrow")
    elif name.startswith("ann_batch_tables_"):
        # multi-table stored index (VERDICT r8 #7): build-included
        # would distort the query cost, so the T-table index is built
        # untimed here (cached corpus scan) and only the query is
        # timed — matching ann_batch_query's stored-snapshot scenario.
        t = int(name.rsplit("_t", 1)[1])
        sets = plane_tables(t)
        idx = build_ann_index(corpus, "vec_id", "embedding",
                              sets if t > 1 else sets[0], tables=t)
        idx.write.mode("overwrite").parquet(IDX_STORE + f".t{t}")
        idx = spark.read.parquet(IDX_STORE + f".t{t}")
        start = time.monotonic()
        out = query_ann_index(batch, idx, "vec_id", "embedding",
                              sets if t > 1 else sets[0], k=K,
                              rescore="arrow", tables=t)
    elif name.startswith("ann_batch_query"):
        # "ann_batch_query" or "ann_batch_query_pN" (multi-probe)
        probes = int(name.rsplit("_p", 1)[1]) if "_p" in name[15:] \
            else 1
        idx = spark.read.parquet(IDX_STORE)    # corpus floats untouched
        out = query_ann_index(batch, idx, "vec_id", "embedding",
                              PLANES, k=K, rescore="arrow",
                              n_probes=probes)
    elif name == "brute_batch_query":
        out = cosine_topk(corpus, "vec_id", "embedding", k=K,
                          queries=batch)       # rescans corpus floats
    elif name == "semantic_dedup":
        # k sized to the corpus (SCALE.md: cells ~N/k; 50k/64 ≈ 780)
        out = semantic_dedup(corpus, "vec_id", "embedding", k=64,
                             iters=2, threshold=0.35)
    else:
        raise SystemExit(f"unknown op {name}")
    out.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - start, 3)


def recall(n_probes: int = 1) -> dict:
    """recall@5 of the stored-index path vs brute-force ground truth,
    over a deterministic 2k-query sample (vec_id % 25 == 0: one query
    per replica family)."""
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, cosine_topk, query_ann_index)
    spark = _spark()
    build_corpus(spark)
    corpus = spark.read.parquet(SCRATCH)
    qs = corpus.where(F.col("vec_id") % REPLICAS == 0)
    truth = cosine_topk(corpus, "vec_id", "embedding", k=K, queries=qs) \
        .select("query_id", "neighbor_id")
    idx = build_ann_index(corpus, "vec_id", "embedding", PLANES)
    got = query_ann_index(qs, idx, "vec_id", "embedding", PLANES,
                          k=K, rescore="arrow", n_probes=n_probes) \
        .select("query_id", "neighbor_id")
    n_truth = truth.count()
    hit = truth.join(got, ["query_id", "neighbor_id"]).count()
    return {"queries": qs.count(), "k": K, "n_probes": n_probes,
            "recall_at_5": round(hit / n_truth, 4)}


def recall_tables(t: int, bits: int = 8) -> dict:
    """recall@5 of the T-table stored index vs brute-force truth,
    same 2k-query sample as :func:`recall` — plus ROUTING recall
    (the fraction of true top-5 pairs whose neighbor lands in the
    candidate set, i.e. shares a bucket in >= 1 table). Routing is
    what ``tables`` controls; end-to-end recall is additionally
    capped by the int8 rescore (the index deliberately carries no
    float vectors), a ceiling measured independently in
    BASELINE.md §r9."""
    from wp_etl_migration_spark.operators.similarity import (
        build_ann_index, cosine_topk, hyperplane_bucket,
        query_ann_index)
    spark = _spark()
    build_corpus(spark)
    corpus = spark.read.parquet(SCRATCH)
    qs = corpus.where(F.col("vec_id") % REPLICAS == 0)
    truth = cosine_topk(corpus, "vec_id", "embedding", k=K,
                        queries=qs).select("query_id", "neighbor_id") \
        .localCheckpoint()
    sets = plane_tables(t)
    idx = build_ann_index(corpus, "vec_id", "embedding",
                          sets if t > 1 else sets[0], tables=t,
                          bits=bits)
    got = query_ann_index(qs, idx, "vec_id", "embedding",
                          sets if t > 1 else sets[0], k=K,
                          rescore="arrow", tables=t) \
        .select("query_id", "neighbor_id")
    n_truth = truth.count()
    hit = truth.join(got, ["query_id", "neighbor_id"]).count()
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bk = corpus.select(
        "vec_id", *[hyperplane_bucket(v, s, 64).alias(f"b{i}")
                    for i, s in enumerate(sets)]).localCheckpoint()
    a = bk.select(F.col("vec_id").alias("query_id"),
                  *[F.col(f"b{i}").alias(f"qa{i}") for i in range(t)])
    b = bk.select(F.col("vec_id").alias("neighbor_id"),
                  *[F.col(f"b{i}").alias(f"qb{i}") for i in range(t)])
    cond = None
    for i in range(t):
        c = F.col(f"qa{i}") == F.col(f"qb{i}")
        cond = c if cond is None else (cond | c)
    routed = truth.join(a, "query_id").join(b, "neighbor_id") \
        .where(cond).count()
    return {"queries": qs.count(), "k": K, "tables": t, "bits": bits,
            "recall_at_5": round(hit / n_truth, 4),
            "routing_recall_at_5": round(routed / n_truth, 4)}


def table_study() -> int:
    """Multi-table recall/cost points (VERDICT r8 #7): per T tables,
    a COLD-session timed batch query (2k queries vs the 50k stored
    T-table index) + recall@5 vs brute truth; brute batch cost for
    reference. The regime this exists for: single-set multi-probe
    plateaus at ~0.975 (misses >= 2 sign flips away), independent
    tables route those pairs together in SOME table."""
    out = {"metric": "sf1_ann_multi_table", "unit": "sec",
           "vectors": 2000 * REPLICAS, "planes_per_table": len(PLANES),
           "curve": []}
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--op",
         "brute_batch_query"],
        capture_output=True, text=True, env=dict(os.environ))
    if proc.returncode == 0:
        out["brute_batch_sec"] = json.loads(
            proc.stdout.strip().splitlines()[-1])["sec"]
    for t in (1, 2, 3):
        tt = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--op",
             f"ann_batch_tables_t{t}"],
            capture_output=True, text=True, env=dict(os.environ))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--recall-tables", str(t)],
            capture_output=True, text=True, env=dict(os.environ))
        if tt.returncode != 0 or r.returncode != 0:
            print(json.dumps({"error": (tt.stderr + r.stderr)[-500:]}))
            return 1
        rr = json.loads(r.stdout.strip().splitlines()[-1])
        out["curve"].append({
            "tables": t,
            "sec": json.loads(
                tt.stdout.strip().splitlines()[-1])["sec"],
            "recall_at_5": rr["recall_at_5"],
            "routing_recall_at_5": rr["routing_recall_at_5"]})
    print(json.dumps(out))
    return 0


def probe_study() -> int:
    """Multi-probe recall/cost curve (VERDICT r5 #7): per n_probes, a
    COLD-session timed batch query (2k queries vs the 50k stored
    index) + recall@5 vs brute-force truth, plus the brute-force
    batch cost for reference."""
    out = {"metric": "sf1_ann_multi_probe", "unit": "sec",
           "vectors": 2000 * REPLICAS, "planes": len(PLANES),
           "curve": []}
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--op",
         "brute_batch_query"],
        capture_output=True, text=True, env=dict(os.environ))
    if proc.returncode == 0:
        out["brute_batch_sec"] = json.loads(
            proc.stdout.strip().splitlines()[-1])["sec"]
    for n in (1, 2, 3, 4):
        op = "ann_batch_query" if n == 1 else f"ann_batch_query_p{n}"
        t = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--op", op],
            capture_output=True, text=True, env=dict(os.environ))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--recall-probes", str(n)],
            capture_output=True, text=True, env=dict(os.environ))
        if t.returncode != 0 or r.returncode != 0:
            print(json.dumps({"error": (t.stderr + r.stderr)[-500:]}))
            return 1
        out["curve"].append({
            "n_probes": n,
            "sec": json.loads(t.stdout.strip().splitlines()[-1])["sec"],
            "recall_at_5": json.loads(
                r.stdout.strip().splitlines()[-1])["recall_at_5"]})
    print(json.dumps(out))
    return 0


OPS = ("cosine_topk_self", "ann_index_self", "ann_batch_query",
       "brute_batch_query", "semantic_dedup")


def study() -> int:
    timings: dict[str, list[float]] = {o: [] for o in OPS}
    for r in range(3):
        order = OPS if r % 2 == 0 else tuple(reversed(OPS))
        for op in order:                       # alternating cold runs
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--op", op],
                capture_output=True, text=True, env=dict(os.environ))
            if proc.returncode != 0:
                print(json.dumps({"error": proc.stderr[-500:]}))
                return 1
            timings[op].append(
                json.loads(proc.stdout.strip().splitlines()[-1])["sec"])
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--recall"],
        capture_output=True, text=True, env=dict(os.environ))
    rec = json.loads(proc.stdout.strip().splitlines()[-1]) \
        if proc.returncode == 0 else {"error": proc.stderr[-300:]}
    med = {o: sorted(t)[1] for o, t in timings.items()}
    print(json.dumps({
        "metric": "sf1_embedding_family", "unit": "sec",
        "vectors": 2000 * REPLICAS, "planes": len(PLANES),
        "runs": timings,
        "min": {o: min(t) for o, t in timings.items()},
        "median": med,
        "self_query_ann_vs_brute":
            round(min(timings["ann_index_self"])
                  / min(timings["cosine_topk_self"]), 2),
        "batch_query_brute_vs_ann":
            round(min(timings["brute_batch_query"])
                  / min(timings["ann_batch_query"]), 2),
        "recall": rec,
    }))
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--study" in args:
        sys.exit(study())
    if "--probe-study" in args:
        sys.exit(probe_study())
    if "--table-study" in args:
        sys.exit(table_study())
    if "--recall-tables" in args:
        bits = int(args[args.index("--bits") + 1]) \
            if "--bits" in args else 8
        print(json.dumps(recall_tables(
            int(args[args.index("--recall-tables") + 1]), bits=bits)))
        sys.exit(0)
    if "--recall-probes" in args:
        print(json.dumps(recall(
            int(args[args.index("--recall-probes") + 1]))))
        sys.exit(0)
    if "--recall" in args:
        print(json.dumps(recall()))
        sys.exit(0)
    if "--op" in args:
        print(json.dumps({"op": args[args.index("--op") + 1],
                          "sec": run_op(args[args.index("--op") + 1])}))
        sys.exit(0)
    sys.exit(study())
