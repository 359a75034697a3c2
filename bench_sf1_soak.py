#!/usr/bin/env python
"""sf1 soak for the incremental stores (VERDICT r10 #6): one decade
of scale evidence for the continuous-dedup and ANN maintenance loops.

The 100 TB story for ``IncrementalDedup`` / ``IncrementalAnnIndex``
rests on sf0.1 soaks plus the probe-cost model (batch cost = batch
work ∝ batch size + one scan of the sub-pruned index, BASELINE.md
§r8). This script measures the model's scaling exponent directly: it
builds a derived ~10× corpus ("sf1-equivalent" — the bench_sf1_dedup
replica recipe: 10 deterministic lightly-perturbed replicas per doc,
near-dups across replicas so the dedup loop does real LSH work; the
embedding twin perturbs each replica's vector by a deterministic
offset so every batch has true near-neighbors) into a scratch sf-dir,
then runs the SAME soak harness (``bench_streaming_soak.soak_dedup``
/ ``soak_ann`` — identical code path, identical knobs) at both
scales, batch count matched.

Per scale it reports steady-state batch wall (median of the fold-free
batches after the first), the trickle probe-bytes fraction (dedup),
and the wall-scaling exponent log10(wall_sf1 / wall_sf01) — the model
predicts ≈ 1 (batch cost linear in batch size, probe bounded), vs 2
for anything quadratic in corpus and ≫1 for a loop that recomputes
the growing corpus.

Scratch parquet lives under .scratch/ (gitignored); testdata is never
modified. Prints ONE JSON line.

Run: python bench_sf1_soak.py [--batches 10] [--soak dedup|ann|both]
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F

REPLICAS = 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".scratch", "sf1_soak_dir")


def _soak_module():
    spec = importlib.util.spec_from_file_location(
        "bench_streaming_soak",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_streaming_soak.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_sf1_dir(spark) -> str:
    """Materialize the 10× documents + embeddings tables as a scratch
    sf-dir the soak harness can point at unchanged."""
    os.makedirs(SCRATCH, exist_ok=True)
    docs_out = os.path.join(SCRATCH, "documents.parquet")
    emb_out = os.path.join(SCRATCH, "embeddings.parquet")
    if not (os.path.exists(os.path.join(docs_out, "_SUCCESS"))
            and os.path.exists(os.path.join(emb_out, "_SUCCESS"))):
        docs = spark.read.parquet(
            os.path.join(SRC, "documents.parquet")) \
            .select("doc_id", "text")
        # Replica id stride: max(id)+1, not count() — count is only
        # collision-free when ids are dense in [0, n); sparse/larger
        # ids would silently collide across replicas and understate
        # corpus growth (r11 ADVICE).
        n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
        reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
        words = F.split(F.col("text"), r"\s+")
        perturbed = F.array_join(
            F.transform(
                words,
                lambda w, i: F.when(
                    (i % (F.lit(11) + F.col("rep"))) == F.lit(0),
                    F.concat(F.lit("rep"), F.col("rep").cast("string")))
                .otherwise(w)),
            " ")
        (docs.crossJoin(F.broadcast(reps))
         .select((F.col("doc_id") + F.col("rep") * F.lit(n_docs))
                 .alias("doc_id"),
                 F.when(F.col("rep") == 0, F.col("text"))
                 .otherwise(perturbed).alias("text"))
         .repartition(32)
         .write.mode("overwrite").parquet(docs_out))
        emb = spark.read.parquet(
            os.path.join(SRC, "embeddings.parquet")) \
            .select("vec_id", "embedding")
        n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
        (emb.crossJoin(F.broadcast(reps))
         .select((F.col("vec_id") + F.col("rep") * F.lit(n_vec))
                 .alias("vec_id"),
                 F.transform(
                     F.col("embedding").cast("array<double>"),
                     lambda x, i: x + 0.015 * F.sin(
                         1.7 * F.col("rep").cast("double")
                         + 0.41 * i.cast("double")))
                 .alias("embedding"))
         .repartition(32)
         .write.mode("overwrite").parquet(emb_out))
    return SCRATCH


def _steady(r: dict) -> float:
    """Median fold-free batch wall, first batch (JVM warmup) dropped."""
    trig = {x.get("at_batch") for x in r.get("auto_compactions", [])}
    ids = r.get("data_batch_ids", list(range(len(r["walls"]))))
    walls = [w for w, i in zip(r["walls"], ids)
             if i not in trig][1:]
    return round(statistics.median(walls), 3)


def main(argv: list[str]) -> int:
    batches = int(argv[argv.index("--batches") + 1]) \
        if "--batches" in argv else 10
    which = argv[argv.index("--soak") + 1] if "--soak" in argv \
        else "both"
    from wp_etl_migration_spark.session import get_spark
    spark = get_spark("wp-etl-sf1-soak",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    soak = _soak_module()
    sf1_dir = build_sf1_dir(spark)
    out = {"metric": "sf1_soak_scaling", "unit": "sec",
           "batches": batches, "replicas": REPLICAS, "scales": {}}
    for label, sf in (("sf0.1", SRC), ("sf1", sf1_dir)):
        work = tempfile.mkdtemp(prefix=f"sf1soak_{label}_")
        entry = {}
        try:
            if which in ("dedup", "both"):
                t0 = time.monotonic()
                d = soak.soak_dedup(spark, sf, batches,
                                    os.path.join(work, "dedup"))
                entry["dedup"] = {
                    "walls": d["walls"],
                    "steady_wall": _steady(d),
                    "total_wall": round(time.monotonic() - t0, 1),
                    "corpus_rows_final": d["corpus_rows"][-1],
                    "probe_fraction": [
                        round(t["digest_probe_bytes"]
                              / t["digest_store_bytes"], 4)
                        for t in d["trickle"]],
                    "band_probe_fraction": [
                        round(t["band_probe_bytes"]
                              / t["band_store_bytes"], 4)
                        for t in d["trickle"]],
                }
            if which in ("ann", "both"):
                t0 = time.monotonic()
                a = soak.soak_ann(spark, sf, batches,
                                  os.path.join(work, "ann"))
                entry["ann"] = {
                    "walls": a["walls"],
                    "steady_wall": _steady(a),
                    "total_wall": round(time.monotonic() - t0, 1),
                    "index_rows_final": a["index_rows"][-1],
                }
        finally:
            shutil.rmtree(work, ignore_errors=True)
        out["scales"][label] = entry
    for k in ("dedup", "ann"):
        lo = out["scales"]["sf0.1"].get(k)
        hi = out["scales"]["sf1"].get(k)
        if lo and hi:
            out[f"{k}_wall_exponent"] = round(
                math.log10(hi["steady_wall"] / lo["steady_wall"]), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
