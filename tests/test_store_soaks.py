"""Long-running store SOAKS and exhaustive crash sweeps — the four
heaviest incremental-store tests (~4.5 min of the file's ~8), split
out so the parallel suite's pole shrinks (VERDICT r12 #7
follow-through; see tools/partest.py)."""

from __future__ import annotations

import pytest  # noqa: F401

from pyspark.sql import functions as F  # noqa: F401


def test_incremental_soak_latency_flat(spark, tmp_path):
    """Store-growth soak bound (VERDICT r5 #6): 12 backfill batches
    through each incremental loop; per-batch wall time must stay
    ~flat as the on-disk stores grow (index-append, never
    recompute-the-corpus). Bound: median of the last 3 batches <=
    2x the median of batches 2-4 (batch 1 pays JVM/Arrow warmup).
    The 20-batch sf0.1 runs live in BASELINE.md via
    bench_streaming_soak.py."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_streaming_soak",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_streaming_soak.py"))
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)

    sf = "/root/testdata/sf0.001"
    d = soak.soak_dedup(spark, sf, 12, str(tmp_path / "dedup"))
    a = soak.soak_ann(spark, sf, 12, str(tmp_path / "ann"))

    def fold_free(r):
        # Auto-compaction folds run INSIDE the triggering batch's wall
        # (r9 default) — a known, amortized, separately-measured spike
        # (BASELINE.md §r9), not store-growth drift; the flatness
        # bound compares fold-free batches so a fold landing in the
        # late window can't fail the growth check.
        trig = {x.get("at_batch") for x in r.get("auto_compactions",
                                                 [])}
        ids = r.get("data_batch_ids", list(range(len(r["walls"]))))
        return [w for w, i in zip(r["walls"], ids) if i not in trig]

    for name, r in (("dedup", d), ("ann", a)):
        walls = fold_free(r)
        # MIN of each window, 2.5x bound: the guarded failure mode
        # (recomputing the growing corpus per batch — the rejected r7
        # design measured 10->27 s) is a >=5x drift even on its best
        # batch, while a hot full-suite JVM jitters single batches by
        # 2x+ (observed: medians flaked twice in suite context,
        # never standalone). Mins resist spikes in both windows.
        late, early = min(walls[-3:]), min(walls[1:4])
        assert late <= 2.5 * early, (
            f"{name}: batch latency grew with store size "
            f"({r['walls']}) — the loop is recomputing the corpus")
        assert r["auto_compactions"], (
            f"{name}: auto-compaction never fired — the soak no "
            "longer exercises the default policy")
    # stores actually grew (the bound must not pass vacuously)
    assert d["band_rows"][-1] > d["band_rows"][0]
    # data batches all indexed, plus the r11 trickle probes' vectors
    assert a["index_rows"][-1] == 12 * a["batch_vectors"] + \
        sum(t["vectors"] for t in a["trickle"])
    # r12 (VERDICT r11 #5): the ANN trickle's probe BYTES are bounded
    # like the dedup flatness — a 10-vector batch lists a strict
    # fraction of the stored index (sub-pruned base + unpruned tail).
    # A broken sub-prune reads ~the whole store (fraction → 1); the
    # measured steady state is 0.53–0.61 here and 0.52–0.57 at sf0.1
    # (BASELINE.md §r11), so 0.8 is a regression gate, not a tune.
    assert a["trickle"], "ann trickle probes never fired"
    for t in a["trickle"]:
        frac = t["index_probe_bytes"] / t["index_store_bytes"]
        assert frac <= 0.8, (
            f"ann trickle after batch {t['after_batch']} listed "
            f"{frac:.0%} of the stored index — sub-pruning no longer "
            f"bounds small-batch probes: {a['trickle']}")


def test_incremental_soak_takedown_bounded(spark, tmp_path):
    """Takedown-under-soak bound (VERDICT r10 #5): mid-soak deletes +
    physical purges must (a) actually purge rows from grown stores,
    (b) cost no more than a normal data batch (purge scales with HIT
    partitions, not store size), and (c) leave the post-purge batch
    walls inside the same flatness envelope as the plain soak — the
    sf0.1 walls live in BASELINE.md via
    ``bench_streaming_soak.py --takedown``."""
    import importlib.util
    import os
    import statistics

    spec = importlib.util.spec_from_file_location(
        "bench_streaming_soak",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_streaming_soak.py"))
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)

    sf = "/root/testdata/sf0.001"
    d = soak.soak_dedup(spark, sf, 8, str(tmp_path / "dedup"),
                        takedown=True)
    a = soak.soak_ann(spark, sf, 8, str(tmp_path / "ann"),
                      takedown=True)
    for name, r in (("dedup", d), ("ann", a)):
        events = r["takedowns"]
        assert len(events) == 2, f"{name}: takedowns never fired"
        med = statistics.median(r["walls"][1:])
        for ev in events:
            assert ev["rows_purged"] >= 1, (
                f"{name}: purge found nothing — the event no longer "
                f"exercises the rewrite path: {ev}")
            assert ev["partitions_rewritten"] >= 1
            # a purge (hit partitions only) must stay in the same
            # cost class as one data batch against the same store
            assert ev["purge_wall"] <= 2.0 * med + 1.0, (
                f"{name}: purge cost left the batch cost class "
                f"({ev['purge_wall']} s vs median batch {med} s)")
            assert ev["delete_wall"] <= 2.0 * med + 1.0
        # post-purge batches stay in the flatness envelope
        late, early = min(r["walls"][-3:]), min(r["walls"][1:4])
        assert late <= 2.5 * early, (
            f"{name}: post-purge batch latency left the envelope "
            f"({r['walls']})")
    # the second dedup purge ran against a strictly larger corpus yet
    # rewrote only its own hit partitions
    assert d["takedowns"][1]["corpus_rows_after"] > \
        d["takedowns"][0]["corpus_rows_after"]


def test_purge_corpus_crash_sweep_every_mutation_point(spark,
                                                       tmp_path):
    """Systematic crash-point sweep for the purge swap machinery: for
    every k, the k-th filesystem mutation (_rename or _delete) during
    purge_corpus raises; a subsequent clean purge must always
    converge to the same end state — live view intact, deleted bytes
    gone, no staging/trash residue. Catches any crash window the
    single-point tests miss."""
    from wp_etl_migration_spark.streaming import incremental as inc

    def build(store):
        loop = inc.IncrementalDedup(spark, store, "doc_id", "text",
                                    num_subs=8, rows_per_sub=1,
                                    auto_compact_tail=None)
        loop.process_batch(spark.createDataFrame(
            [(1, "secret sentinel alpha"), (2, "keeper one two")],
            ["doc_id", "text"]), 0)
        loop.process_batch(spark.createDataFrame(
            [(3, "second secret bravo"), (4, "keeper three four")],
            ["doc_id", "text"]), 1)
        loop.delete([1, 3], 2)
        return loop

    real_rename, real_delete = inc._rename, inc._delete
    k = 1
    while True:
        store = str(tmp_path / f"s{k}")
        loop = build(store)
        calls = {"n": 0}

        def crashing(fn):
            def wrapper(*a, **kw):
                calls["n"] += 1
                if calls["n"] == k:
                    raise RuntimeError(f"crash at mutation {k}")
                return fn(*a, **kw)
            return wrapper

        inc._rename = crashing(real_rename)
        inc._delete = crashing(real_delete)
        try:
            try:
                loop.purge_corpus()
                crashed = False
            except RuntimeError:
                crashed = True
        finally:
            inc._rename, inc._delete = real_rename, real_delete

        # recovery: a clean purge converges whatever the crash point
        loop.purge_corpus()
        assert sorted(r.doc_id for r in loop.corpus().collect()) \
            == [2, 4], k
        raw = spark.read.parquet(f"{store}/corpus")
        assert {r.doc_id for r in raw.collect()} == {2, 4}, k
        import os
        assert not os.path.exists(f"{store}/corpus_purge_trash"), k
        assert not os.path.exists(f"{store}/corpus_purge_staging"), k
        if not crashed:
            break       # k exceeded the total mutation count: done
        k += 1
    assert k > 3        # the sweep really exercised multiple windows


def test_purge_matches_crash_sweep_every_mutation_point(spark,
                                                        tmp_path):
    """The purge_matches twin of the corpus crash sweep: crash at
    every filesystem-mutation call in turn; a subsequent clean
    purge_matches must always converge — no deleted-id references in
    the feed, survivors intact, zero staging/trash residue."""
    from wp_etl_migration_spark.streaming import incremental as inc
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]

    def build(store):
        idx = inc.IncrementalAnnIndex(spark, store, "vec_id", "emb",
                                      planes, k=2, num_subs=8,
                                      rows_per_sub=1,
                                      auto_compact_tail=None)
        idx.process_batch(spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, emb array<double>"), 0)
        idx.process_batch(spark.createDataFrame(
            [(10, [0.95, 0.05, 0.0, 0.0]),
             (20, [0.05, 0.95, 0.0, 0.0])],
            "vec_id long, emb array<double>"), 1)
        return idx

    real_rename, real_delete = inc._rename, inc._delete
    k = 1
    while True:
        store = str(tmp_path / f"s{k}")
        idx = build(store)
        calls = {"n": 0}

        def crashing(fn):
            def wrapper(*a, **kw):
                calls["n"] += 1
                if calls["n"] == k:
                    raise RuntimeError(f"crash at mutation {k}")
                return fn(*a, **kw)
            return wrapper

        inc._rename = crashing(real_rename)
        inc._delete = crashing(real_delete)
        try:
            try:
                idx.purge_matches([1])
                crashed = False
            except RuntimeError:
                crashed = True
        finally:
            inc._rename, inc._delete = real_rename, real_delete

        idx.purge_matches([1])
        feed = spark.read.parquet(f"{store}/matches")
        assert feed.where("query_id = 1 or neighbor_id = 1") \
            .count() == 0, k
        assert feed.where("neighbor_id = 2").count() > 0, k
        import os
        assert not os.path.exists(f"{store}/matches_purge_trash"), k
        assert not os.path.exists(f"{store}/matches_purge_staging"), k
        if not crashed:
            break
        k += 1
    assert k > 3
