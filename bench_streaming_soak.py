#!/usr/bin/env python
"""Streaming soak for the continuous dedup + ANN maintenance loops
(VERDICT r5 #6): the two-batch tests prove semantics; this measures
latency as the on-disk stores GROW. 20 batches of sf0.1-sized data
stream through ``IncrementalDedup`` / ``IncrementalAnnIndex``
(``process_batch`` backfill mode — same code path foreachBatch runs),
recording per-batch wall time and store size. The design claim under
test: each batch's cost is (batch work) + (one scan of the stored
*index*, which grows linearly but is tiny vs the corpus) — NOT a
recompute of the corpus, so the trend stays ~flat.

Batch content (deterministic): batch b re-ids the sf table by
``id + b·N``; 10% of each dedup batch repeats batch-0 text verbatim
(exercising the digest index on every batch), the rest is made unique
with a per-batch suffix token. ANN batches perturb the embedding by a
per-batch deterministic offset, so every batch has true near-neighbors
in earlier batches.

Compaction is AUTOMATIC (r9, VERDICT r8 #3): no manual compact()
call exists in this soak — each store folds its committed tail from
within process_batch once it exceeds auto_compact_tail=5 partitions,
and the triggering batch's wall INCLUDES the fold (the honest
amortized steady-state latency; cadence events are reported from the
pointer's "auto" note). Every 5th dedup batch additionally runs a
10-doc TRICKLE batch (the steady-state shape of a continuous loop),
recording the sub-pruned probe's listable bytes vs the full index
size — the tail+base store layout's bounded-probe claim, measured as
the store grows. rows_per_sub is demo-sized (16) so the soak-scale
base fans out; production keeps the 1M default.

Takedown mode (``--takedown``, VERDICT r10 #5): every 4th data batch
is followed by a mid-soak takedown — delete 1/50th of that batch's
ids, then run the physical purge (``purge_corpus`` for the dedup
loop, ``purge_matches`` for ANN) — so purge cost and post-purge batch
latency are measured against GROWING stores round over round, on
either pointer protocol, instead of the one-off r10 rig. Each event
records delete/purge walls + rows and partitions touched; the batches
that follow a purge stay in the normal wall series, so the flatness
bound also guards post-purge probe regressions.

Run:  python bench_streaming_soak.py [--soak dedup|ann] [--batches 20]
      [--sf-dir /root/testdata/sf0.1] [--takedown] [--stationary]
      [--prepared-budget BYTES]  # ANN max_prepared_bytes (r12)
Prints ONE JSON line with per-batch walls + store row counts.
``--stationary`` switches the ANN batch generator to constant
true-match density (each batch matches only its twin), isolating
store-side cost from workload growth — see ``soak_ann``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _spark():
    from wp_etl_migration_spark.session import get_spark
    spark = get_spark("wp-etl-streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _store_bytes(path: str, subs: list[int] | None = None) -> int:
    """On-disk data bytes under ``path``; with ``subs`` given, only
    the matching sub= dirs — i.e. exactly the files a sub-pruned
    probe scan lists."""
    want = None if subs is None else {f"sub={s}" for s in subs}
    total = 0
    for root, _dirs, files in os.walk(path):
        if want is not None and os.path.basename(root) not in want:
            continue
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if not f.startswith("_"))
    return total


def _index_bytes(store, key_df, key_col) -> int:
    """Bytes an index probe lists: each compacted run pruned to the
    probe keys' sub-buckets under that run's modulus, plus the full
    tail. key_df=None measures the whole store."""
    total = _store_bytes(store.root)                    # tail
    for run in store.runs():
        subs = None
        if key_df is not None:
            subs = store._subs_of(key_df, key_col,
                                  int(run["num_subs"]))
        total += _store_bytes(
            os.path.join(store.root + "_base", f"gen-{run['gen']}"),
            subs)
    return total


def _protocol():
    """Pointer-protocol under soak: default versioned, or the
    Delta-log-emulating action log via --protocol actionlog /
    $SOAK_POINTER_PROTOCOL — the format-mapping claim exercised at
    soak scale, not just in the unit matrix."""
    from wp_etl_migration_spark.streaming.incremental import (
        ActionLogPointer)
    name = os.environ.get("SOAK_POINTER_PROTOCOL", "versioned")
    return ActionLogPointer() if name == "actionlog" else None


def soak_dedup(spark, sf_dir: str, batches: int,
               store: str, takedown: bool = False) -> dict:
    from wp_etl_migration_spark.operators.dedup import (
        content_digest, lsh_bands)
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    docs = spark.read.parquet(os.path.join(sf_dir,
                                           "documents.parquet")) \
        .select("doc_id", "text").localCheckpoint(eager=True)
    n = docs.count()
    # rows_per_sub=16 (demo default) sizes the soak-scale base to fan
    # out enough for the 10-doc trickle probe (80 band hashes) to
    # prune; at 100 TB the production default (1M rows/sub) reaches
    # the num_subs cap on its own. --rows-per-sub overrides (pass
    # 1000000 to measure the production file layout at soak scale).
    # Compaction is AUTOMATIC (r9): the store folds its committed
    # tail from within process_batch once it exceeds 5 partitions —
    # no manual compact() anywhere in this soak. The triggering
    # batch's wall therefore INCLUDES the fold (the honest amortized
    # steady-state latency); auto events are reported from the
    # pointer's cadence note.
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            max_bucket=64, num_subs=256,
                            rows_per_sub=int(os.environ.get(
                                "SOAK_ROWS_PER_SUB", "16")),
                            auto_compact_tail=5,
                            pointer_protocol=_protocol())
    walls, corpus_rows, band_rows = [], [], []
    trickle, autos, data_ids, takedowns = [], [], [], []
    next_id = 0
    for b in range(batches):
        # 10% exact repeats of batch-0 text (digest index hits every
        # batch); the rest interleave a per-batch token between every
        # word so their shingle sets are genuinely new (a mere suffix
        # would leave them near-dups of batch 0 — correctly dropped by
        # the LSH pass, but then the soak would measure an empty
        # append path).
        batch = docs.select(
            (F.col("doc_id") + b * n).alias("doc_id"),
            F.when(F.col("doc_id") % 10 == 0, F.col("text"))
            .otherwise(F.regexp_replace(F.col("text"), " ",
                                        f" w{b} ")).alias("text"))
        bid = next_id
        next_id += 1
        data_ids.append(bid)
        folded_before = (loop._digest_store.pointer()
                         or {}).get("folded_up_to", -1)
        t0 = time.monotonic()
        loop.process_batch(batch, bid)
        walls.append(round(time.monotonic() - t0, 3))
        ptr = loop._digest_store.pointer() or {}
        if ptr.get("folded_up_to", -1) != folded_before:
            autos.append(dict(ptr.get("auto") or {},
                              folded_up_to=ptr.get("folded_up_to")))
        corpus_rows.append(
            spark.read.parquet(f"{store}/corpus").count())
        # base + tail (the tail dir may be empty right after compact)
        band_rows.append(loop._band_store.probe(-1).count())
        # Trickle probe (every 5th batch): a 10-doc batch — the
        # steady-state shape of a continuous loop — recording the
        # sub-pruned probe's LISTABLE bytes vs the full index. Probe
        # bytes are bounded by the trickle batch's own key spread
        # plus the auto-compaction-bounded tail; the base keeps
        # growing underneath — that gap is the layout's claim,
        # measured. Trickle batch ids stay MONOTONE with the data
        # batches (the compaction contract).
        if (b + 1) % 5 == 0:
            tb = next_id
            next_id += 1
            small = docs.where(F.col("doc_id") % 500 == 0).select(
                (F.col("doc_id") + (1000 + b) * n).alias("doc_id"),
                F.regexp_replace(F.col("text"), " ",
                                 f" t{b} ").alias("text"))
            dstore, bstore = loop._digest_store, loop._band_store
            small_bands = lsh_bands(small, "doc_id", "text", loop.n,
                                    loop.num_hashes,
                                    loop.rows_per_band)
            folded_before = (dstore.pointer()
                             or {}).get("folded_up_to", -1)
            t0 = time.monotonic()
            loop.process_batch(small, tb)
            ptr = dstore.pointer() or {}
            if ptr.get("folded_up_to", -1) != folded_before:
                autos.append(dict(ptr.get("auto") or {},
                                  folded_up_to=ptr.get("folded_up_to"),
                                  trickle=True))
            trickle.append({
                "after_batch": b + 1,
                "wall": round(time.monotonic() - t0, 3),
                "digest_probe_bytes": _index_bytes(
                    dstore, small, content_digest(["text"])),
                "digest_store_bytes": _index_bytes(dstore, None, None),
                "band_probe_bytes": _index_bytes(
                    bstore, small_bands, F.col("band_hash")),
                "band_store_bytes": _index_bytes(bstore, None, None),
            })
        # Takedown event (VERDICT r10 #5, every 4th data batch):
        # tombstone 1/5th of the JUST-ingested batch's surviving ids,
        # then run the physical corpus purge against the grown store —
        # purge cost must track HIT partitions, not store size, round
        # over round. The following data batches stay in the normal
        # wall series, so the flatness bound above also guards the
        # post-purge probe path.
        if takedown and (b + 1) % 4 == 0:
            # ids that actually LIVE in the corpus (dedup drops most
            # soak docs), 1/5th of the current batch's survivors —
            # otherwise the purge finds no hit partitions and the
            # soak measures an empty rewrite. Bounded to the batch's
            # id range [b*n, (b+1)*n) so trickle docs (offset by
            # (1000+b')*n) are never swept in (r11 ADVICE).
            doomed = [int(r[0]) for r in loop.corpus()
                      .where((F.col("doc_id") >= b * n)
                             & (F.col("doc_id") < (b + 1) * n)
                             & (F.col("doc_id") % 5 == 0))
                      .select("doc_id").collect()]
            tb = next_id
            next_id += 1
            t0 = time.monotonic()
            loop.delete(doomed, tb)
            d_wall = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            res = loop.purge_corpus()
            takedowns.append({
                "after_batch": b + 1, "deleted_ids": len(doomed),
                "delete_wall": d_wall,
                "purge_wall": round(time.monotonic() - t0, 3),
                **res,
                "corpus_rows_after": spark.read.parquet(
                    f"{store}/corpus").count()})
    return {"walls": walls, "corpus_rows": corpus_rows,
            "band_rows": band_rows, "batch_docs": n,
            "num_subs": loop.num_subs, "trickle": trickle,
            "auto_compactions": autos, "data_batch_ids": data_ids,
            "takedowns": takedowns}


def soak_ann(spark, sf_dir: str, batches: int, store: str,
             takedown: bool = False, stationary: bool = False) -> dict:
    """Default batch generator: every batch is a small perturbation of
    the SAME base vectors, so batch b has true near-neighbors in ALL
    prior batches — match density (and the verify join's real work)
    grows linearly with history BY CONSTRUCTION. That exercises the
    match path hard but conflates workload growth with store growth
    (the r11 sf1 caveat, BASELINE.md §r11). ``stationary=True``
    instead gives batch b the base vectors rotated by ``b // 2``
    positions (+ a tiny perturbation on odd batches): rotations of
    the same vectors are mutually far in cosine, so each odd batch
    matches ONLY its even twin — constant per-batch true-match
    density, isolating store-side cost as the store grows."""
    import math
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    emb = spark.read.parquet(os.path.join(sf_dir,
                                          "embeddings.parquet")) \
        .select("vec_id", "embedding").localCheckpoint(eager=True)
    n = emb.count()
    dims = len(emb.first().embedding)
    # Plane count sizes the LSH bucket space (2^planes buckets).
    # Per-batch candidate cost is batch_size × bucket OCCUPANCY
    # (store / buckets) — occupancy, not store size, is the flat-wall
    # invariant, so planes must scale with the corpus the soak
    # targets: 8 (256 buckets) suits the sf0.1 20-batch run; the sf1
    # stationary study (BASELINE.md §r11) uses 14 (16k buckets).
    # $SOAK_PLANES / --planes overrides.
    n_planes = int(os.environ.get("SOAK_PLANES", "8"))
    # r12: full-rank family — the sinusoid set this replaces was
    # rank 2 (≤ 2p sign regions however many planes; see
    # operators.similarity.seeded_planes), so "256 buckets" was
    # really ≤ 16 and plane count was a ~no-op occupancy lever.
    from wp_etl_migration_spark.operators.similarity import (
        seeded_planes)
    planes = seeded_planes(n_planes, dims)
    # rows_per_sub demo-sized like the dedup soak: the compacted base
    # then fans out into enough sub-buckets for the 100-vector
    # trickle's probe to prune (production keeps the 1M default and
    # reaches the num_subs cap on its own corpus volume).
    # $SOAK_PREPARED_BUDGET / --prepared-budget: max_prepared_bytes
    # for the loop (r12 budget lever) — lets the soak measure the
    # budgeted cost shape between the cached and uncached extremes.
    budget = os.environ.get("SOAK_PREPARED_BUDGET")
    loop = IncrementalAnnIndex(spark, store, "vec_id", "embedding",
                               planes, k=5, auto_compact_tail=5,
                               rows_per_sub=int(os.environ.get(
                                   "SOAK_ROWS_PER_SUB", "16")),
                               pointer_protocol=_protocol(),
                               max_prepared_bytes=(
                                   None if budget is None
                                   else int(budget)))
    walls, index_rows, match_rows = [], [], []
    autos, data_ids, takedowns, trickle = [], [], [], []
    next_id = 0
    for b in range(batches):
        if stationary:
            rot = (b // 2) % dims
            base = (F.concat(F.slice("embedding", rot + 1, dims - rot),
                             F.slice("embedding", 1, rot))
                    if rot else F.col("embedding"))
            vec = (F.transform(base.cast("array<double>"),
                               lambda x, i: x + 0.01 * F.sin(
                                   0.9 * F.lit(float(b))
                                   + 0.7 * i.cast("double")))
                   if b % 2 else base.cast("array<double>"))
            batch = emb.select(
                (F.col("vec_id") + b * n).alias("vec_id"),
                vec.alias("embedding"))
        else:
            batch = emb.select(
                (F.col("vec_id") + b * n).alias("vec_id"),
                F.transform(F.col("embedding").cast("array<double>"),
                            lambda x, i: x + 0.02 * F.sin(
                                3.0 * F.lit(float(b))
                                + 0.5 * i.cast("double")))
                .alias("embedding"))
        bid = next_id
        next_id += 1
        data_ids.append(bid)
        folded_before = (loop._ann_store.pointer()
                         or {}).get("folded_up_to", -1)
        t0 = time.monotonic()
        loop.process_batch(batch, bid)  # auto-compacts when tail > 5
        walls.append(round(time.monotonic() - t0, 3))
        ptr = loop._ann_store.pointer() or {}
        if ptr.get("folded_up_to", -1) != folded_before:
            autos.append(dict(ptr.get("auto") or {},
                              folded_up_to=ptr.get("folded_up_to")))
        index_rows.append(loop._ann_store.probe(-1).count())
        match_rows.append(
            spark.read.parquet(f"{store}/matches").count())
        # Trickle probe (every 5th batch, r11 — the ANN twin of the
        # dedup soak's trickle): a 10-vector batch, the steady-state
        # shape of a continuous loop. With probed-bucket pruning
        # (query_ann_index r11) its wall must stay ~flat as the index
        # grows — a small batch's cost is O(probed buckets), only a
        # bulk batch pays the index-linear scan.
        if (b + 1) % 5 == 0:
            tb = next_id
            next_id += 1
            small = emb.where(F.col("vec_id") % (max(n // 10, 1))
                              == 0).select(
                (F.col("vec_id") + (1000 + b) * n).alias("vec_id"),
                F.transform(F.col("embedding").cast("array<double>"),
                            lambda x, i: x + 0.03 * F.sin(
                                7.0 * F.lit(float(b))
                                + 0.9 * i.cast("double")))
                .alias("embedding"))
            from wp_etl_migration_spark.operators.similarity import (
                hyperplane_bucket)
            small_buckets = small.select(hyperplane_bucket(
                F.transform(F.col("embedding"),
                            lambda x: x.cast("double")),
                planes, dims).alias("__bucket"))
            t0 = time.monotonic()
            loop.process_batch(small, tb)
            trickle.append({
                "after_batch": b + 1,
                "wall": round(time.monotonic() - t0, 3),
                "vectors": small.count(),
                # bounded-probe evidence, ANN twin of the dedup
                # trickle's fractions: listable bytes of the trickle's
                # sub-pruned probe vs the whole index store
                "index_probe_bytes": _index_bytes(
                    loop._ann_store, small_buckets,
                    F.col("__bucket")),
                "index_store_bytes": _index_bytes(
                    loop._ann_store, None, None),
                "index_rows": index_rows[-1]})
        # Takedown event (VERDICT r10 #5): tombstone 1/50th of the
        # just-ingested batch's vector ids out of the probe-able
        # index, then physically rewrite every matches/ partition
        # referencing them on either side (the feed is append-only
        # history — purge_matches is the compliance path).
        if takedown and (b + 1) % 4 == 0:
            doomed = [int(r[0]) for r in emb
                      .where(F.col("vec_id") % 50 == 0)
                      .select((F.col("vec_id") + b * n)).collect()]
            tb = next_id
            next_id += 1
            t0 = time.monotonic()
            loop.delete(doomed, tb)
            d_wall = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            res = loop.purge_matches(doomed)
            takedowns.append({
                "after_batch": b + 1, "deleted_ids": len(doomed),
                "delete_wall": d_wall,
                "purge_wall": round(time.monotonic() - t0, 3),
                **res,
                "match_rows_after": spark.read.parquet(
                    f"{store}/matches").count()})
    return {"walls": walls, "index_rows": index_rows,
            "match_rows": match_rows, "batch_vectors": n,
            "auto_compactions": autos, "trickle": trickle,
            "data_batch_ids": data_ids, "takedowns": takedowns}


def main(argv: list[str]) -> int:
    which = argv[argv.index("--soak") + 1] if "--soak" in argv \
        else "both"
    batches = int(argv[argv.index("--batches") + 1]) \
        if "--batches" in argv else 20
    if "--protocol" in argv:
        os.environ["SOAK_POINTER_PROTOCOL"] = \
            argv[argv.index("--protocol") + 1]
    if "--rows-per-sub" in argv:
        os.environ["SOAK_ROWS_PER_SUB"] = \
            argv[argv.index("--rows-per-sub") + 1]
    if "--planes" in argv:
        os.environ["SOAK_PLANES"] = argv[argv.index("--planes") + 1]
    if "--prepared-budget" in argv:
        os.environ["SOAK_PREPARED_BUDGET"] = \
            argv[argv.index("--prepared-budget") + 1]
    sf_dir = argv[argv.index("--sf-dir") + 1] if "--sf-dir" in argv \
        else os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    takedown = "--takedown" in argv
    stationary = "--stationary" in argv
    spark = _spark()
    out = {"metric": "streaming_soak", "unit": "sec",
           "batches": batches, "sf": sf_dir,
           "takedown": takedown, "stationary": stationary,
           "protocol": os.environ.get("SOAK_POINTER_PROTOCOL",
                                      "versioned")}
    work = tempfile.mkdtemp(prefix="soak_")
    try:
        if which in ("dedup", "both"):
            out["dedup"] = soak_dedup(spark, sf_dir, batches,
                                      os.path.join(work, "dedup"),
                                      takedown=takedown)
        if which in ("ann", "both"):
            out["ann"] = soak_ann(spark, sf_dir, batches,
                                  os.path.join(work, "ann"),
                                  takedown=takedown,
                                  stationary=stationary)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    for k in ("dedup", "ann"):
        if k in out:
            w = out[k]["walls"]
            # needs batches >= 5 for disjoint early/late medians
            out[k]["late_vs_early"] = round(
                sorted(w[-3:])[1] / sorted(w[1:4])[1], 2) \
                if len(w) >= 5 else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
