"""Continuous ANN index loop (streaming/incremental.IncrementalAnnIndex)
+ the stored-ANN purge/stats surfaces — split from test_streaming.py
(VERDICT r12 #7 follow-through: that file was the parallel suite's
single long pole; the ANN loop block is its largest independent
slice)."""

from __future__ import annotations

import pytest  # noqa: F401

from pyspark.sql import functions as F  # noqa: F401


def test_incremental_ann_index_stream_two_batches(spark, tmp_path):
    """Continuous stored-ANN maintenance: batch 2 queries hit batch 1
    vectors through the int8 index alone — batch 1 is never
    re-bucketed/re-quantized (its stored rows are byte-identical after
    batch 2), and matches are strictly backward (no in-batch pairs)."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store = str(tmp_path / "ann_store")
    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=2)

    b1 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [0.0, 0.0, 1.0, 0.0])],
        "vec_id long, emb array<double>")
    b1.coalesce(1).write.parquet(str(in_dir / "batch1"))
    q = idx.run_stream(
        spark.readStream.schema(b1.schema).parquet(str(in_dir) + "/*"))
    q.awaitTermination()
    # empty index at batch 1: no matches, 3 index rows appended
    assert spark.read.parquet(f"{store}/matches").count() == 0
    def canon(df):
        return {(r.vec_id, r.bucket, tuple(r.qvec), r.scale)
                for r in df.collect()}

    rows1 = canon(spark.read.parquet(f"{store}/ann"))
    assert len(rows1) == 3

    b2 = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0, 0.0]),      # near stored vector 1
         (11, [0.88, 0.12, 0.0, 0.0])],   # near 1 AND near 10
        "vec_id long, emb array<double>")
    b2.coalesce(1).write.parquet(str(in_dir / "batch2"))
    q = idx.run_stream(
        spark.readStream.schema(b1.schema).parquet(str(in_dir) + "/*"))
    q.awaitTermination()
    matches = spark.read.parquet(f"{store}/matches").collect()
    got = {(r.query_id, r.neighbor_id) for r in matches}
    assert (10, 1) in got                  # batch-2 query hit batch-1
    assert (11, 1) in got
    # strictly backward: 10/11 are not in the index during their batch
    assert (10, 11) not in got and (11, 10) not in got
    top = {r.query_id: r for r in matches if r.rank == 1}
    assert top[10].neighbor_id == 1 and top[10].sim > 0.9
    # batch-1 index rows were reused, not recomputed: byte-identical
    rows2 = canon(spark.read.parquet(f"{store}/ann"))
    assert rows1 <= rows2 and len(rows2) == 5
    # replaying an already-indexed batch is a no-op (foreachBatch is
    # at-least-once on retry): no duplicate index or match rows
    idx.process_batch(b2, 1)
    assert len(canon(spark.read.parquet(f"{store}/ann"))) == 5
    assert spark.read.parquet(f"{store}/matches").count() == \
        len(matches)


def test_incremental_ann_replay_between_writes(spark, tmp_path):
    """foreachBatch replay safety for the ANN loop (ADVICE r5): a
    retry of a batch that crashed BETWEEN the matches write and the
    ann append must end with exactly one copy of every match row
    (the per-batch overwrite subdir replaces the partial write), and a
    retry of a fully-committed batch must touch nothing (the committed
    match rows survive)."""
    import os
    import shutil

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    store = str(tmp_path / "store")
    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=2)
    b1 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),
         (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [0.0, 0.0, 1.0, 0.0])],
        "vec_id long, emb array<double>")
    b2 = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0, 0.0]),
         (11, [0.88, 0.12, 0.0, 0.0])],
        "vec_id long, emb array<double>")
    idx.process_batch(b1, 0)
    ann_b1 = str(tmp_path / "ann_after_b1")
    shutil.copytree(os.path.join(store, "ann"), ann_b1)

    idx.process_batch(b2, 1)
    def match_rows():
        return sorted((r.query_id, r.neighbor_id, r.rank) for r in
                      spark.read.parquet(f"{store}/matches").collect())
    committed = match_rows()
    assert committed  # b2 really matched b1 vectors

    # Simulate a crash between the two writes: matches/batch_id=1
    # landed, the ann append did not. Replay must converge to the
    # committed state, not duplicate the match rows.
    shutil.rmtree(os.path.join(store, "ann"))
    shutil.copytree(ann_b1, os.path.join(store, "ann"))
    idx.process_batch(b2, 1)
    assert match_rows() == committed
    assert spark.read.parquet(f"{store}/ann").count() == 5

    # Replay of a fully-committed batch: no-op, matches survive.
    idx.process_batch(b2, 1)
    assert match_rows() == committed
    assert spark.read.parquet(f"{store}/ann").count() == 5

    # Crash MID-write of ann/batch_id=1: only one of b2's index rows
    # landed in the partition. The retry must restore the FULL match
    # set (not just the un-indexed remainder's), with no in-batch
    # self-matches from the partially-written own partition, and a
    # complete ann/ without duplicating the row that did land.
    ann = spark.read.parquet(os.path.join(store, "ann")) \
        .localCheckpoint(eager=True)
    partial = ann.where(F.col("vec_id") == 10).drop("batch_id")
    shutil.rmtree(os.path.join(store, "ann", "batch_id=1"))
    partial.write.parquet(os.path.join(store, "ann", "batch_id=1"))
    idx.process_batch(b2, 1)
    assert match_rows() == committed
    final = spark.read.parquet(os.path.join(store, "ann"))
    assert final.count() == 5
    assert final.select("vec_id").distinct().count() == 5


def test_incremental_ann_prepared_cache_equivalence(spark, tmp_path):
    """The prepared-base cache (r12) changes WHERE the dequantize
    runs, never the results: the same batch sequence through a cached
    and an uncached loop produces identical matches/ and ann/ stores,
    through compaction and a mid-soak delete — and compaction retires
    cached gens (no unpersisted-frame leak against swept dirs)."""
    import random

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    rng = random.Random(7)
    dims = 4
    planes = [[rng.gauss(0, 1) for _ in range(dims)]
              for _ in range(2)]
    batches = [
        spark.createDataFrame(
            [(b * 100 + i,
              [random.Random(b * 1000 + i).gauss(0, 1)
               for _ in range(dims)]) for i in range(30)],
            ["vec_id", "embedding"]).localCheckpoint(eager=True)
        for b in range(6)]
    loops, stores = {}, {}
    for flag in (True, False):
        store = str(tmp_path / f"store_{int(flag)}")
        loop = IncrementalAnnIndex(
            spark, store, "vec_id", "embedding", planes, k=3,
            auto_compact_tail=2, rows_per_sub=8,
            cache_prepared_base=flag)
        for b, batch in enumerate(batches):
            if b == 4:
                loop.delete([100 + 3, 200 + 7], b * 10 + 5)
            loop.process_batch(batch, b * 10)
        loops[flag], stores[flag] = loop, store

    def snap(store, sub):
        return {tuple(r) for r in
                spark.read.parquet(f"{store}/{sub}").collect()}

    assert snap(stores[True], "matches") == snap(stores[False],
                                                 "matches")
    assert len(snap(stores[True], "matches")) > 0
    cached_idx = {r["vec_id"] for r in loops[True]._ann_store
                  .probe(-1).select("vec_id").collect()}
    plain_idx = {r["vec_id"] for r in loops[False]._ann_store
                 .probe(-1).select("vec_id").collect()}
    assert cached_idx == plain_idx
    # tombstoned ids are invisible to probes on both paths
    assert 103 not in cached_idx and 207 not in cached_idx
    # the cache was actually exercised and tracks only LIVE gens
    cached = loops[True]
    assert cached._prepared_cache, "cache never populated"
    ptr = cached._ann_store.pointer()
    live = {int(r["gen"]) for r in ptr["runs"]}
    assert set(cached._prepared_cache) <= live
    # one more batch after compaction still answers identically
    extra = spark.createDataFrame(
        [(900 + i, [random.Random(9000 + i).gauss(0, 1)
                    for _ in range(dims)]) for i in range(30)],
        ["vec_id", "embedding"]).localCheckpoint(eager=True)
    for flag in (True, False):
        loops[flag].process_batch(extra, 100)
    assert snap(stores[True], "matches") == snap(stores[False],
                                                 "matches")


def test_incremental_ann_prepared_budget(spark, tmp_path):
    """``max_prepared_bytes`` (r12 follow-up): the byte budget picks
    the LARGEST live gens that fit and serves the rest through the
    lazy path — results identical at every budget, the cache holding
    exactly what the budget admits (0 ⇒ never populated; sized to
    the biggest run ⇒ that run alone), and ``stats()`` reporting the
    occupancy the budget decisions were made from."""
    import os
    import random

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    rng = random.Random(11)
    dims = 4
    planes = [[rng.gauss(0, 1) for _ in range(dims)]
              for _ in range(2)]
    batches = [
        spark.createDataFrame(
            [(b * 100 + i,
              [random.Random(b * 1000 + i).gauss(0, 1)
               for _ in range(dims)]) for i in range(30)],
            ["vec_id", "embedding"]).localCheckpoint(eager=True)
        for b in range(6)]

    def run(budget, tag):
        loop = IncrementalAnnIndex(
            spark, str(tmp_path / tag), "vec_id", "embedding",
            planes, k=3, auto_compact_tail=2, rows_per_sub=8,
            max_prepared_bytes=budget)
        for b, batch in enumerate(batches):
            loop.process_batch(batch, b * 10)
        return loop

    free = run(None, "free")
    bpr = free._prepared_row_bytes()
    assert bpr == dims * 8 + 48
    # discover the final run sizes from the unbounded loop's store
    store = free._ann_store
    sizes = {int(r["gen"]): base.count()
             for r, base in store.probe_parts(-1)[1]}
    assert len(sizes) >= 2, "harness needs ≥2 live runs to budget"
    # same tie-break as the greedy: (rows, gen) descending
    biggest = max(sizes, key=lambda g: (sizes[g], g))

    # deterministic replay: same batches ⇒ same fold history/gens
    exact = run(sizes[biggest] * bpr, "exact")
    none = run(0, "none")
    assert set(exact._ann_store.pointer()["runs"][0].keys()) == \
        set(store.pointer()["runs"][0].keys())

    def matches(loop):
        return {tuple(r) for r in spark.read.parquet(
            os.path.join(loop.store_dir, "matches")).collect()}

    assert matches(free) == matches(exact) == matches(none)
    assert len(matches(free)) > 0
    # budget 0: the cache never admits anything
    assert none._prepared_cache == {}
    # budget exactly the biggest run: it alone is cached (greedy
    # largest-first leaves no room for a second gen)
    assert set(exact._prepared_cache) == {biggest}
    # the row-count memo tracks only live gens
    live = {int(r["gen"]) for r in exact._ann_store.pointer()["runs"]}
    assert set(exact._gen_rows) <= live
    st = exact.stats()["ann"]
    assert st["prepared_gens"] == [biggest]
    assert st["prepared_est_bytes"] == sizes[biggest] * bpr
    # unbudgeted loops memoize sizes for free at prewarm time (the
    # materializing count doubles as the memo — no dedicated jobs)
    # so their stats() still report the cache estimate
    assert set(free._gen_rows) <= {int(r["gen"]) for r in
                                   store.pointer()["runs"]}
    assert free.stats()["ann"]["prepared_est_bytes"] == sum(
        free._gen_rows[g] * bpr for g in free._prepared_cache
        if g in free._gen_rows)


def test_incremental_ann_same_id_redelivered_later_batch(spark, tmp_path):
    """ADVICE r6: a later batch whose ids are ALL already indexed used
    to short-circuit and write no matches partition at all, and a
    partially-redelivered batch queried a shrunken index. With
    partition-precise exclusion the batch is scored against the FULL
    earlier index and always writes its match partition; re-delivered
    ids are indexed under both batches (index key is (batch_id, id)).
    Same-id self-matches stay excluded — that is query_ann_index's
    id-identity contract, not the replay logic."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    store = str(tmp_path / "store")
    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=2)
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 0)
    # batch 1: ids 1 and 2 re-delivered (old code: short-circuit,
    # no matches partition) plus a fresh probe id near stored 1
    idx.process_batch(spark.createDataFrame(
        [(1, [0.95, 0.05, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]),
         (30, [0.9, 0.1, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 1)
    matches = spark.read.parquet(f"{store}/matches")
    got = {(r.query_id, r.neighbor_id) for r in
           matches.where(F.col("batch_id") == 1).collect()}
    # the match partition exists and the fresh probe hit the stored
    # batch-0 vector through the full (un-shrunken) index
    assert (30, 1) in got
    # id identity: a re-delivered id never matches its stored self
    assert (1, 1) not in got and (2, 2) not in got
    ann = spark.read.parquet(f"{store}/ann")
    assert sorted((r.vec_id, r.batch_id) for r in ann.collect()) \
        == [(1, 0), (1, 1), (2, 0), (2, 1), (30, 1)]


def test_incremental_ann_compaction_and_pruned_match(spark, tmp_path):
    """ANN twin: compact folds ann tail partitions into the
    sub-bucketed base; a single-vector trickle query still finds its
    stored neighbor through the sub-pruned probe (the neighbor shares
    the query's bucket, hence its sub)."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    store = str(tmp_path / "store")
    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=2, num_subs=16, rows_per_sub=1)
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [0.0, 0.0, 1.0, 0.0]), (4, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, emb array<double>"), 0)
    idx.compact(0)
    gen = idx._ann_store.runs()[0]["gen"]
    base_dir = os.path.join(store, "ann_base", f"gen-{gen}")
    assert any(d.startswith("sub=") for d in os.listdir(base_dir))
    assert not os.path.exists(os.path.join(store, "ann", "batch_id=0"))
    idx.process_batch(spark.createDataFrame(
        [(10, [0.95, 0.05, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 1)
    got = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        f"{store}/matches").where(F.col("batch_id") == 1).collect()}
    assert (10, 1) in got


def test_incremental_ann_multi_probe_prunes_to_probed_buckets(
        spark, tmp_path):
    """n_probes>1 on the incremental ANN store: the base sub-prune
    must cover every PROBED bucket, not just the query's own — a
    neighbor one flipped sign bit away lives in a different bucket
    (usually a different sub), and forgetting the expansion would
    prune it out of the probe read."""
    import os

    from wp_etl_migration_spark.operators.similarity import (
        plane_dots, probe_buckets_from_dots)
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    store = str(tmp_path / "store")
    # neighbor [0.9, -0.05]: bucket "10"; query [0.95, 0.05]: bucket
    # "11" with plane 2 the lowest |margin| — probe 2 flips to "10".
    corpus = spark.createDataFrame(
        [(1, [0.9, -0.05, 0.0, 0.0]),
         (2, [-1.0, 1.0, 0.0, 0.0]), (3, [-1.0, -1.0, 0.0, 0.0]),
         (4, [0.3, 0.9, 0.0, 0.0]), (5, [-0.2, -0.9, 0.1, 0.0]),
         (6, [-0.9, 0.2, 0.3, 0.0]), (7, [0.1, -0.8, 0.0, 0.2]),
         (8, [-0.5, -0.5, 0.5, 0.0])],
        "vec_id long, emb array<double>")
    query = spark.createDataFrame([(10, [0.95, 0.05, 0.0, 0.0])],
                                  "vec_id long, emb array<double>")
    # unit: the expansion really is own-bucket-then-flip
    v = F.transform(F.col("emb"), lambda x: x.cast("double"))
    probes = query.select(probe_buckets_from_dots(
        plane_dots(v, planes), 2, 2).alias("p")).first()["p"]
    assert probes == ["11", "10"]

    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=2, n_probes=2, num_subs=64,
                              rows_per_sub=1)
    idx.process_batch(corpus, 0)
    idx.compact(0)
    assert not os.path.exists(os.path.join(store, "ann", "batch_id=0"))
    idx.process_batch(query, 1)
    got = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        f"{store}/matches").where(F.col("batch_id") == 1).collect()}
    assert (10, 1) in got    # found across the flipped-bit bucket


def test_incremental_ann_delete_tombstones(spark, tmp_path):
    """ANN-twin takedown: a deleted vector id stops appearing as a
    neighbor immediately, a re-indexed delivery at a later batch is
    matchable again, and compaction purges the tombstoned index
    rows."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    store = str(tmp_path / "store")
    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=1, num_subs=8, rows_per_sub=1,
                              auto_compact_tail=None)
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 0)
    q = [(10, [0.95, 0.05, 0.0, 0.0])]
    idx.process_batch(spark.createDataFrame(
        q, "vec_id long, emb array<double>"), 1)
    got = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        f"{store}/matches").where(F.col("batch_id") == 1).collect()}
    assert (10, 1) in got

    idx.delete([1], 2)
    idx.process_batch(spark.createDataFrame(
        [(11, [0.95, 0.05, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 3)
    got3 = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        f"{store}/matches").where(F.col("batch_id") == 3).collect()}
    assert all(n != 1 for _, n in got3)

    # compaction folds + physically purges the tombstoned row
    idx.compact(3)
    ptr = idx._ann_store.pointer()
    run_dir = os.path.join(store, "ann_base",
                           f"gen-{ptr['runs'][0]['gen']}")
    stored = {r.vec_id for r in spark.read.parquet(run_dir).collect()}
    assert 1 not in stored and {2, 10, 11} <= stored

    # re-ingest of the deleted id at a later batch is matchable again
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 4)
    idx.process_batch(spark.createDataFrame(
        [(12, [0.98, 0.01, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 5)
    got5 = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        f"{store}/matches").where(F.col("batch_id") == 5).collect()}
    assert (12, 1) in got5


def test_incremental_ann_multi_table_and_bits(spark, tmp_path):
    """Multi-table + rescore-precision knobs reach the continuous
    loop: a neighbor on the far side of BOTH table-1 planes (2 sign
    flips — invisible to the single-table n_probes=1 probe) is found
    through table 2's independent planes; the stored rows carry the
    table column and int16-range qvecs; compaction + sub-pruned
    probing still work with the widened schema."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    t0 = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    t1 = [[0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    corpus = spark.createDataFrame(
        [(1, [-0.9, -0.05, 0.1, 0.1]),   # t0 "00" (2 flips), t1 "11"
         (2, [0.5, 0.5, -1.0, -1.0])],   # t0 "11", t1 "00"
        "vec_id long, emb array<double>")
    query = spark.createDataFrame(
        [(10, [0.95, 0.05, 0.1, 0.1])],  # t0 "11", t1 "11"
        "vec_id long, emb array<double>")

    # single table, single probe: only vec 2 shares the t0 bucket
    single = IncrementalAnnIndex(spark, str(tmp_path / "s1"),
                                 "vec_id", "emb", t0, k=2,
                                 auto_compact_tail=None)
    single.process_batch(corpus, 0)
    single.process_batch(query, 1)
    got1 = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        str(tmp_path / "s1" / "matches"))
        .where(F.col("batch_id") == 1).collect()}
    assert (10, 1) not in got1 and (10, 2) in got1

    # two tables + int16: vec 1 arrives via table 2's shared bucket
    idx = IncrementalAnnIndex(spark, str(tmp_path / "s2"),
                              "vec_id", "emb", [t0, t1], k=3,
                              tables=2, bits=16, num_subs=16,
                              rows_per_sub=1, auto_compact_tail=None)
    idx.process_batch(corpus, 0)
    stored = spark.read.parquet(
        str(tmp_path / "s2" / "ann" / "batch_id=0"))
    assert "table" in stored.columns
    assert stored.count() == 4            # 2 vectors x 2 tables
    assert stored.agg(F.max(F.array_max("qvec"))).first()[0] > 127
    idx.process_batch(query, 1)
    got2 = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        str(tmp_path / "s2" / "matches"))
        .where(F.col("batch_id") == 1).collect()}
    assert (10, 1) in got2 and (10, 2) in got2

    # compaction folds the widened schema; the sub-pruned probe still
    # routes the cross-table match
    idx.compact(1)
    assert not os.path.exists(
        str(tmp_path / "s2" / "ann" / "batch_id=0"))
    idx.process_batch(spark.createDataFrame(
        [(11, [0.95, 0.05, 0.1, 0.1])],
        "vec_id long, emb array<double>"), 2)
    got3 = {(r.query_id, r.neighbor_id) for r in spark.read.parquet(
        str(tmp_path / "s2" / "matches"))
        .where(F.col("batch_id") == 2).collect()}
    assert (11, 1) in got3


def test_ann_purge_matches(spark, tmp_path):
    """purge_matches (r10): a takedown id disappears from the
    append-only matches feed on BOTH sides, surviving feed rows and
    untouched partitions are intact, and a second call is a no-op.
    The embedding twin of purge_corpus."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    store = str(tmp_path / "store")
    idx = IncrementalAnnIndex(spark, store, "vec_id", "emb", planes,
                              k=2, num_subs=8, rows_per_sub=1,
                              auto_compact_tail=None)
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 0)
    # batch 1: 10 matches 1 (query side keeps 10, neighbor side = 1)
    idx.process_batch(spark.createDataFrame(
        [(10, [0.95, 0.05, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 1)
    # batch 2: 20 matches 2 only — partition must NOT be rewritten
    idx.process_batch(spark.createDataFrame(
        [(20, [0.05, 0.95, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 2)
    feed = spark.read.parquet(f"{store}/matches")
    assert feed.where("query_id = 1 or neighbor_id = 1").count() > 0
    import os
    mtime2 = os.path.getmtime(f"{store}/matches/batch_id=2")

    res = idx.purge_matches([1])
    assert res["partitions_rewritten"] >= 1
    assert res["rows_purged"] >= 1
    feed2 = spark.read.parquet(f"{store}/matches")
    assert feed2.where("query_id = 1 or neighbor_id = 1").count() == 0
    # the id-2 matches survive, and batch 2's partition was untouched
    assert feed2.where("neighbor_id = 2").count() > 0
    assert os.path.getmtime(f"{store}/matches/batch_id=2") == mtime2
    assert not os.path.exists(f"{store}/matches_purge_trash")
    assert not os.path.exists(f"{store}/matches_purge_staging")
    # idempotent
    assert idx.purge_matches([1]) == {"partitions_rewritten": 0,
                                      "rows_purged": 0}


def test_ann_loop_stats(spark, tmp_path):
    """IncrementalAnnIndex.stats() — empty store, mid-stream, after
    delete and compaction (observability parity with the text
    loop)."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    planes = [[1.0, -1.0, 0.5, 0.25], [-0.5, 1.0, -1.0, 0.75]]
    idx = IncrementalAnnIndex(spark, str(tmp_path / "s"),
                              "vec_id", "emb", planes, k=1,
                              num_subs=8, rows_per_sub=1,
                              auto_compact_tail=None)
    s0 = idx.stats()
    assert s0 == {"match_rows": 0,
                  "ann": {"tail_partitions": 0, "pointer": None,
                          "live_tombstones": 0,
                          "prepared_gens": [],
                          "prepared_est_bytes": 0}}
    idx.process_batch(spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 0)
    idx.process_batch(spark.createDataFrame(
        [(10, [0.95, 0.05, 0.0, 0.0])],
        "vec_id long, emb array<double>"), 1)
    idx.delete([1], 2)
    s1 = idx.stats()
    assert s1["match_rows"] >= 1
    assert s1["ann"]["tail_partitions"] == 2
    assert s1["ann"]["live_tombstones"] == 1
    idx.compact(2)
    s2 = idx.stats()
    assert s2["ann"]["tail_partitions"] == 0
    assert s2["ann"]["pointer"]["folded_up_to"] == 2
    assert s2["ann"]["pointer"]["tomb_gen"] == 0


def test_prepared_budget_skips_zero_row_gens(spark, tmp_path):
    """ADVICE r12: a 0-row gen fits ANY budget (0·bpr ≤ budget, even
    a 0-byte one) but has nothing worth a persist slot — the greedy
    fill must skip it, both under a 0 budget and under a budget that
    admits its non-empty sibling."""
    import random

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    rng = random.Random(5)
    planes = [[rng.gauss(0, 1) for _ in range(4)] for _ in range(2)]
    empty = spark.createDataFrame([], "neighbor_id long")
    full = spark.createDataFrame([(i,) for i in range(7)],
                                 "neighbor_id long")
    runs = [({"gen": 1}, empty), ({"gen": 2}, full)]
    ptr = {"runs": [{"gen": 1}, {"gen": 2}]}

    def fresh(budget, tag):
        return IncrementalAnnIndex(
            spark, str(tmp_path / tag), "vec_id", "embedding",
            planes, max_prepared_bytes=budget)

    loop = fresh(10 ** 9, "big")
    assert loop._sync_prepared_cache(runs, ptr) == {2}
    assert loop._gen_rows == {1: 0, 2: 7}
    assert fresh(0, "zero")._sync_prepared_cache(runs, ptr) == set()
    # unbudgeted: selection is the live set, no count jobs
    free = fresh(None, "free")
    assert free._sync_prepared_cache(runs, ptr) == {1, 2}
    assert free._gen_rows == {}


def test_incremental_ann_rejects_degenerate_planes(spark, tmp_path):
    """The continuous loop refuses a rank-deficient plane family at
    CONSTRUCTION (before any store directory exists); the
    maintenance-only planes=None construction stays legal."""
    import math

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalAnnIndex)
    old = [[math.sin(0.1 + p * 7.3 + i * 0.61) for i in range(16)]
           for p in range(6)]
    with pytest.raises(ValueError, match="degenerate"):
        IncrementalAnnIndex(spark, str(tmp_path / "s"), "vec_id",
                            "embedding", old)
    assert not (tmp_path / "s").exists()
    IncrementalAnnIndex(spark, str(tmp_path / "s2"), "vec_id",
                        "embedding", None)   # maintenance-only: fine
