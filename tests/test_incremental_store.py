"""Incremental index STORES: the continuous-dedup loop, the leveled
compaction + versioned-pointer machinery, tombstone takedowns, purge
crash sweeps, and the pointer-protocol plugins — split from
test_streaming.py (VERDICT r12 #7 follow-through: that file was the
parallel suite's single long pole and this block is most of it;
tests/test_streaming_ann.py carries the ANN-loop slice)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401


def test_incremental_dedup_stream_two_batches(spark, tmp_path):
    """Continuous dedup via foreachBatch: batch 2 docs duplicating
    batch 1 content (exactly or near) are dropped against the stores
    batch 1 built; genuinely new docs survive and extend the stores."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store = str(tmp_path / "store")
    dedup = IncrementalDedup(spark, store, "doc_id", "text")

    b1 = spark.createDataFrame(
        [(1, base), (2, base),            # in-batch exact dup -> keep 1
         (3, other)], ["doc_id", "text"])
    b1.coalesce(1).write.parquet(str(in_dir / "batch1"))
    q = dedup.run_stream(
        spark.readStream.schema(b1.schema).parquet(str(in_dir) + "/*"))
    q.awaitTermination()
    survivors1 = sorted(r.doc_id for r in
                        spark.read.parquet(f"{store}/corpus").collect())
    assert survivors1 == [1, 3]

    b2 = spark.createDataFrame(
        [(10, base),                       # exact dup of stored 1
         (11, base + " extra"),            # near-dup of stored 1 (LSH)
         (12, "completely different words nothing shared here at all "
              "with anything stored"),
         # new x new near-dup pair WITHIN the batch: keep the min id
         (14, "red orange yellow green blue indigo violet pink brown"),
         (15, "red orange yellow green blue indigo violet pink gray")],
        ["doc_id", "text"])
    b2.coalesce(1).write.parquet(str(in_dir / "batch2"))
    q = dedup.run_stream(
        spark.readStream.schema(b1.schema).parquet(str(in_dir) + "/*"))
    q.awaitTermination()
    survivors = sorted(r.doc_id for r in
                       spark.read.parquet(f"{store}/corpus").collect())
    assert survivors == [1, 3, 12, 14]
    # digest/band stores grew in lockstep with the corpus
    assert spark.read.parquet(f"{store}/digests").count() == 4
    assert spark.read.parquet(f"{store}/bands").count() > 0


def test_incremental_dedup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once on retry: replaying the SAME batch
    must add nothing — the stores exclude the batch's own batch_id
    partition, so the retry recomputes the first attempt's survivors
    and overwrites in place (the claim in streaming/incremental.py)."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    dedup = IncrementalDedup(spark, store, "doc_id", "text")
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")], ["doc_id", "text"])
    dedup.process_batch(batch, 0)
    first = sorted(map(tuple, spark.read.parquet(
        f"{store}/corpus").collect()))
    dedup.process_batch(batch, 0)   # simulated retry of the same batch
    second = sorted(map(tuple, spark.read.parquet(
        f"{store}/corpus").collect()))
    assert first == second
    assert spark.read.parquet(f"{store}/digests").count() == 2
    bands = spark.read.parquet(f"{store}/bands")
    assert bands.select("doc_id").distinct().count() == 2


def test_incremental_dedup_replay_between_writes(spark, tmp_path):
    """Exactly-once store state for the dedup loop (r6): a retry of a
    batch that crashed between (or during) its three partition writes
    must converge to the first attempt's exact store state — no lost
    corpus rows (the old failure mode: partially-written digests made
    replayed docs dedup against THEMSELVES and vanish) and no
    duplicates."""
    import os
    import shutil

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")], ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # dup of 1
         (11, "totally novel words appearing nowhere else at all"),
         (12, "more fresh content unlike anything stored before")],
        ["doc_id", "text"])
    loop.process_batch(b1, 0)
    loop.process_batch(b2, 1)

    def state():
        return {
            "corpus": sorted(r.doc_id for r in spark.read.parquet(
                f"{store}/corpus").collect()),
            "digests": sorted((r.doc_id, r.digest) for r in
                              spark.read.parquet(
                                  f"{store}/digests").collect()),
            "bands": sorted((r.doc_id, r.band, r.band_hash) for r in
                            spark.read.parquet(
                                f"{store}/bands").collect()),
        }
    committed = state()
    assert committed["corpus"] == [1, 2, 11, 12]

    # Crash A: corpus landed, digests PARTIAL (one row), bands absent.
    # Under the old append layout the partial digest made doc 11
    # dedup against itself on replay and drop from the corpus forever.
    digests_full = spark.read.parquet(
        os.path.join(store, "digests")).localCheckpoint(eager=True)
    shutil.rmtree(os.path.join(store, "digests", "batch_id=1"))
    shutil.rmtree(os.path.join(store, "bands", "batch_id=1"))
    partial = digests_full.where(F.col("doc_id") == 11) \
        .select("doc_id", "digest")
    partial.write.parquet(
        os.path.join(store, "digests", "batch_id=1"))
    loop.process_batch(b2, 1)
    assert state() == committed

    # Crash B: everything landed except bands. Replay converges.
    shutil.rmtree(os.path.join(store, "bands", "batch_id=1"))
    loop.process_batch(b2, 1)
    assert state() == committed

    # Full replay of a committed batch: state unchanged.
    loop.process_batch(b2, 1)
    assert state() == committed


def test_incremental_dedup_same_id_redelivered_later_batch(spark, tmp_path):
    """ADVICE r6: upstream re-delivers a doc under the SAME id in a
    LATER batch (new batch_id — not a checkpoint replay). The old
    id anti-join excluded the stored copy's digest, so the re-delivery
    survived exact dedup and the corpus held the id twice. Partition
    exclusion keeps the stored copy visible: identical content drops,
    near-identical content drops, and only genuinely different content
    may land again."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text")
    base = "alpha beta gamma delta epsilon zeta eta theta"
    loop.process_batch(spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven")],
        ["doc_id", "text"]), 0)
    # batch 1 re-delivers id 1 byte-identical and id 2 near-identical
    # (a trailing edit, so the stored shingles are a subset — the
    # LSH-catchable shape)
    loop.process_batch(spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven extra")],
        ["doc_id", "text"]), 1)
    corpus = spark.read.parquet(f"{store}/corpus")
    assert sorted((r.doc_id, r.batch_id) for r in corpus.collect()) \
        == [(1, 0), (2, 0)]           # exactly one copy of each id
    assert spark.read.parquet(f"{store}/digests").count() == 2
    # and a checkpoint replay of the re-delivering batch (identical
    # content, same batch_id) is still idempotent
    loop.process_batch(spark.createDataFrame(
        [(1, base), (2, "one two three four five six seven extra")],
        ["doc_id", "text"]), 1)
    assert spark.read.parquet(f"{store}/corpus").count() == 2


def test_incremental_store_compaction_and_pruned_probe(spark, tmp_path):
    """r8 index layout (VERDICT r7 #3): per-batch tail partitions stay
    flat (v2 — no per-batch small-file tax); compact(up_to) folds them
    into a sub-bucketed base whose probe prunes at the partition
    LISTING (PartitionFilters on sub), with the batch's sub set a
    bounded driver collect. Pruning is exact: a base row outside the
    batch's subs cannot equi-join any batch key."""
    import os

    from wp_etl_migration_spark.operators.dedup import content_digest
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=64, rows_per_sub=1)
    b0 = spark.createDataFrame(
        [(i, f"document body {i} with words aa{i} bb{i} cc{i} dd{i}")
         for i in range(40)], ["doc_id", "text"])
    loop.process_batch(b0, 0)
    # tail partitions are flat — no sub dirs, no extra files
    assert not any(
        d.startswith("sub=") for d in
        os.listdir(os.path.join(store, "digests", "batch_id=0")))

    loop.compact(0)
    dstore = loop._digest_store
    ptr = dstore.pointer()
    assert ptr["folded_up_to"] == 0 and len(ptr["runs"]) == 1
    run = ptr["runs"][0]
    gen, nsubs = run["gen"], run["num_subs"]
    assert gen == 0 and 1 < nsubs <= 64
    base_dir = os.path.join(store, "digests_base", f"gen-{gen}")
    assert any(d.startswith("sub=") for d in os.listdir(base_dir))
    # folded tail dir is gone; the store's content lives in the base
    assert not os.path.exists(
        os.path.join(store, "digests", "batch_id=0"))

    # Trickle batch: ONE doc, an exact dup of stored doc 7. The probe
    # prunes the base to its single digest sub.
    trickle = spark.createDataFrame(
        [(100, "document body 7 with words aa7 bb7 cc7 dd7")],
        ["doc_id", "text"])
    subs = dstore._subs_of(trickle, content_digest(["text"]), nsubs)
    assert len(subs) == 1
    probe = dstore.probe(1, trickle, content_digest(["text"]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert any("sub" in seg[:300]
               for seg in plan.split("PartitionFilters")[1:])
    # the base genuinely spans more subs than the probe touches
    stored_subs = {int(d.split("=", 1)[1])
                   for d in os.listdir(base_dir) if d.startswith("sub=")}
    assert len(stored_subs) > len(subs)
    # and the pruned probe still catches the duplicate end-to-end
    loop.process_batch(trickle, 1)
    ids = sorted(r.doc_id for r in
                 spark.read.parquet(f"{store}/corpus").collect())
    assert 100 not in ids and len(ids) == 40
    # second compact: batch 1's survivors are EMPTY (the trickle doc
    # was a dup), so the fold adds NO run — just the high-water bump.
    loop.compact(1)
    ptr2 = loop._digest_store.pointer()
    assert ptr2["folded_up_to"] == 1 and len(ptr2["runs"]) == 1
    assert loop._digest_store.probe(99).count() == 40


def test_incremental_compaction_crash_after_pointer_flip(spark,
                                                         tmp_path):
    """Crash between the pointer flip and the folded-dir deletes:
    the lingering tail dirs are already invisible to probes (tail
    filters batch_id > folded_up_to), so no row is ever read twice;
    the next compact sweeps the garbage."""
    import os
    import shutil

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=16)
    loop.process_batch(spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")], ["doc_id", "text"]), 0)
    tail0 = os.path.join(store, "digests", "batch_id=0")
    saved = str(tmp_path / "saved_batch0")
    shutil.copytree(tail0, saved)
    loop.compact(0)
    # simulate the unfinished delete: the folded dir reappears
    shutil.copytree(saved, tail0)
    probe = loop._digest_store.probe(5)
    assert probe.count() == 2          # not 4 — garbage is invisible
    # a later batch still dedups exactly once against the store
    loop.process_batch(spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "totally novel words appearing nowhere else at all")],
        ["doc_id", "text"]), 1)
    ids = sorted(r.doc_id for r in
                 spark.read.parquet(f"{store}/corpus").collect())
    assert ids == [1, 2, 11]
    # the next compact sweeps the garbage dir and folds batch 1
    loop.compact(1)
    assert not os.path.exists(tail0)
    assert loop._digest_store.probe(99).count() == 3


def test_incremental_compaction_levels_and_merges(spark, tmp_path):
    """Leveling: each compact folds only the tail into a NEW run
    (no base rewrite) until max_runs would be exceeded, then all runs
    merge into one. Data is preserved across every transition and
    swept gens/tails are gone."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1, max_runs=2)
    def doc(i):
        # fully distinct word sets per doc — no accidental near-dups
        return " ".join(f"w{i}{c}" for c in "abcdefgh")

    for b in range(4):
        loop.process_batch(spark.createDataFrame(
            [(b * 10 + j, doc(b * 10 + j)) for j in range(3)],
            ["doc_id", "text"]), b)
        loop.compact(b)
        runs = loop._digest_store.runs()
        # runs count cycles 1 → 2 → merge back to 1 → 2
        assert len(runs) == (b % 2) + 1, (b, runs)
        assert loop._digest_store.probe(99).count() == 3 * (b + 1)
    # only the pointer-listed gens remain on disk
    gens = {d for d in os.listdir(os.path.join(store, "digests_base"))
            if d.startswith("gen-")}
    assert gens == {f"gen-{r['gen']}"
                    for r in loop._digest_store.runs()}
    # and the dedup semantics still hold through the leveled base
    loop.process_batch(spark.createDataFrame(
        [(100, doc(0)),                        # exact dup of doc 0
         (101, "completely novel words nothing shared anywhere")],
        ["doc_id", "text"]), 4)
    ids = sorted(r.doc_id for r in
                 spark.read.parquet(f"{store}/corpus").collect())
    assert 100 not in ids and 101 in ids


def test_incremental_delete_tombstones_and_reingest(spark, tmp_path):
    """Takedown support (VERDICT r8 #2): delete(ids) stops the ids
    matching probes immediately (delete→probe), a re-ingest of the
    same content at a LATER batch is re-admitted (delete→re-ingest)
    and then dedups normally again, compaction physically purges the
    tombstoned rows from the runs, and the full merge purges the
    committed tombstone set itself (probes return to the no-deletes
    fast path)."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1, max_runs=1,
                            auto_compact_tail=None)
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight"
    loop.process_batch(spark.createDataFrame(
        [(1, t1), (2, t2)], ["doc_id", "text"]), 0)
    # sanity: an exact dup of doc 1 drops while doc 1 is indexed
    loop.process_batch(spark.createDataFrame(
        [(10, t1)], ["doc_id", "text"]), 1)
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [1, 2]

    loop.delete([1], 2)
    # delete → probe: the digest/band rows stop matching immediately
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2}
    assert 1 not in {r.doc_id for r in
                     loop._band_store.probe(99).collect()}
    # the live-corpus read masks the deleted doc too
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2]

    # delete → re-ingest at a LATER batch: re-admitted
    loop.process_batch(spark.createDataFrame(
        [(20, t1)], ["doc_id", "text"]), 3)
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 20]
    # and the re-ingested copy dedups future deliveries again
    loop.process_batch(spark.createDataFrame(
        [(30, t1)], ["doc_id", "text"]), 4)
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 20]

    # first compact (max_runs=1, no prior runs → fold, no merge):
    # folded rows are filtered, the committed tombstone is folded
    loop.compact(4)
    ptr = loop._digest_store.pointer()
    assert ptr["tomb_gen"] == 0 and len(ptr["runs"]) == 1
    run_dir = os.path.join(store, "digests_base",
                           f"gen-{ptr['runs'][0]['gen']}")
    assert 1 not in {r.doc_id for r in
                     spark.read.parquet(run_dir).collect()}
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2, 20}

    # second compact merges (1 run + fold > max_runs=1): every stored
    # row is rewritten-filtered, so the tombstone set purges and the
    # tombs dir disappears — the no-deletes fast path is back
    loop.process_batch(spark.createDataFrame(
        [(40, "totally novel words appearing nowhere else")],
        ["doc_id", "text"]), 5)
    loop.compact(5)
    ptr2 = loop._digest_store.pointer()
    assert ptr2["tomb_gen"] is None and len(ptr2["runs"]) == 1
    assert not os.path.exists(os.path.join(store, "digests_tombs"))
    assert loop._digest_store._tombstones(ptr2) is None
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2, 20, 40}
    assert sorted(r.doc_id for r in loop.corpus().collect()) \
        == [2, 20, 40]


def test_incremental_delete_crash_at_flip_pending_tombstones(
        spark, tmp_path):
    """Crash scenarios around compaction with tombstones in flight
    (VERDICT r8 #2 done-criterion): (a) a compact that dies BEFORE
    the pointer flip leaves the old committed state — the pending
    tombstone still masks at probe time and the retried compact folds
    it; (b) a crash AFTER the flip that resurrects the folded tomb
    tail dir is harmless — the leftover partition is filtered by the
    fold high-water mark."""
    import os
    import shutil

    import pytest as _pytest

    from wp_etl_migration_spark.streaming import incremental as inc
    store = str(tmp_path / "store")
    loop = inc.IncrementalDedup(spark, store, "doc_id", "text",
                                num_subs=8, rows_per_sub=1,
                                auto_compact_tail=None)
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    loop.process_batch(spark.createDataFrame(
        [(1, t1), (2, "one two three four five six seven")],
        ["doc_id", "text"]), 0)
    loop.delete([1], 1)

    # (a) die at the flip: monkeypatch the pointer commit to raise
    real = inc._IndexStore._write_pointer

    def boom(self, ptr):
        raise RuntimeError("crash at flip")

    inc._IndexStore._write_pointer = boom
    try:
        with _pytest.raises(RuntimeError):
            loop.compact(1)
    finally:
        inc._IndexStore._write_pointer = real
    # old committed state: no pointer, tombstone tail intact and live
    assert loop._digest_store.pointer() is None
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2}
    # re-ingest still works off the pending tombstone
    loop.process_batch(spark.createDataFrame(
        [(20, t1)], ["doc_id", "text"]), 2)
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 20]

    # retried compact folds tombstone + survivors idempotently
    loop.compact(2)
    ptr = loop._digest_store.pointer()
    assert ptr["folded_up_to"] == 2 and ptr["tomb_gen"] == 0
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2, 20}

    # (b) crash after flip: the swept tomb tail partition reappears;
    # it is already invisible (batch_id <= folded filter) and a
    # double-applied tombstone could not mask the batch-2 re-ingest
    # anyway (scoped on row batch id)
    tomb_dir = os.path.join(store, "digests_tombs", "batch_id=1")
    # delete() itself refuses a below-fold batch id (ADVICE r9 guard),
    # so the resurrection is simulated the way a crash produces it —
    # the partition files reappear without any API call
    with _pytest.raises(ValueError, match="folded_up_to"):
        loop._digest_store.delete(
            spark.createDataFrame([(1,)], "doc_id long"), 1)
    (spark.createDataFrame([(1,)], "doc_id long")
     .write.mode("overwrite").parquet(tomb_dir))
    assert os.path.exists(tomb_dir)
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2, 20}
    loop.compact(3)  # high-water bump sweeps the garbage
    assert not os.path.exists(tomb_dir)


def test_incremental_auto_compaction_default_on(spark, tmp_path):
    """Auto-compaction (VERDICT r8 #3): process_batch itself folds the
    committed tail once it exceeds auto_compact_tail partitions —
    compact(batch_id - 1), serialized with the batch body — and the
    cadence decision is recorded in the pointer. No manual compact
    calls anywhere."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1,
                            auto_compact_tail=2)

    def doc(i):
        return " ".join(f"w{i}{c}" for c in "abcdefgh")

    for b in range(5):
        loop.process_batch(spark.createDataFrame(
            [(b * 10 + j, doc(b * 10 + j)) for j in range(2)],
            ["doc_id", "text"]), b)
    # batches 0,1: tail 1,2 — no trigger; batch 2: tail 3 > 2 →
    # compact(1); batch 3: tail 2 — no; batch 4: tail 3 > 2 →
    # compact(3). The in-flight batch's partition always stays tail.
    ptr = loop._digest_store.pointer()
    assert ptr["folded_up_to"] == 3
    assert ptr["auto"] == {"at_batch": 4, "tail_parts": 3}
    assert loop._digest_store.tail_batch_count() == 1  # batch 4
    # both index stores compacted in step, nothing lost
    assert loop._band_store.pointer()["folded_up_to"] == 3
    assert loop._digest_store.probe(99).count() == 10
    # knob off ⇒ the old manual behavior (no further folds)
    loop.auto_compact_tail = None
    for b in range(5, 9):
        loop.process_batch(spark.createDataFrame(
            [(b * 10, doc(b * 10))], ["doc_id", "text"]), b)
    assert loop._digest_store.pointer()["folded_up_to"] == 3
    assert loop._digest_store.probe(99).count() == 14


def test_incremental_pointer_commit_atomic_and_degrading(spark,
                                                         tmp_path):
    """ADVICE r8 (medium): the pointer is committed by tmp-write +
    rename to a fresh _CURRENT.v<N> — never an in-place truncating
    create — and the reader takes the highest PARSEABLE version, so
    an empty or garbage newest file (a commit crashed mid-write on an
    FS without atomic rename) degrades to the previous committed
    state instead of wedging every probe with a JSONDecodeError."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1,
                            auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        ["doc_id", "text"]), 0)
    loop.compact(0)
    base = os.path.join(store, "digests_base")
    assert os.path.exists(os.path.join(base, "_CURRENT.v0"))
    good = loop._digest_store.pointer()
    assert good["folded_up_to"] == 0

    # a truncated newer version (crash mid-commit): reader degrades
    open(os.path.join(base, "_CURRENT.v1"), "w").close()
    assert loop._digest_store.pointer() == good
    # unparsable garbage: same degradation
    with open(os.path.join(base, "_CURRENT.v2"), "w") as fh:
        fh.write('{"folded_up_to": 99, "runs"')
    assert loop._digest_store.pointer() == good
    assert loop._digest_store.probe(99).count() == 2

    # the next real commit supersedes the garbage and sweeps it
    loop.process_batch(spark.createDataFrame(
        [(3, "totally novel words here")], ["doc_id", "text"]), 1)
    loop.compact(1)
    ptr = loop._digest_store.pointer()
    assert ptr["folded_up_to"] == 1
    versions = {n for n in os.listdir(base)
                if n.startswith("_CURRENT")}
    assert os.path.join(base, "_CURRENT.v3") and "_CURRENT.v3" in versions
    assert "_CURRENT.v0" not in versions  # swept (keep newest two)
    assert not any(n.startswith("_CURRENT.tmp-") for n in versions)
    assert loop._digest_store.probe(99).count() == 3


def test_incremental_dedup_in_band_deletes(spark, tmp_path):
    """CDC-shaped takedown feed: rows marked op='delete' in the batch
    tombstone their ids before the dedup probes run, so deleted
    content neither blocks nor matches the SAME batch's ingests;
    same-batch delete + re-ingest of the same id resolves delete-wins;
    a replay of the delete-carrying batch is idempotent; and the
    op-marked path works end-to-end through run_stream."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "store")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            auto_compact_tail=None)
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "one two three four five six seven eight"
    loop.process_batch(spark.createDataFrame(
        [(1, t1, "upsert"), (2, t2, None)],
        "doc_id long, text string, op string"), 0, op_col="op")
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [1, 2]

    # batch 1: delete doc 1 AND ingest its exact text under a new id —
    # the tombstone lands first, so 30 is admitted, not deduped away
    b1 = spark.createDataFrame(
        [(1, None, "delete"), (30, t1, "upsert")],
        "doc_id long, text string, op string")
    loop.process_batch(b1, 1, op_col="op")
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 30]
    # replay of batch 1 (crash-retry): byte-identical outcome
    loop.process_batch(b1, 1, op_col="op")
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 30]

    # same-batch delete + re-ingest of the SAME id: delete wins
    loop.process_batch(spark.createDataFrame(
        [(30, None, "delete"), (30, t1, "upsert")],
        "doc_id long, text string, op string"), 2, op_col="op")
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2]
    # ...and a LATER batch re-admits the id
    loop.process_batch(spark.createDataFrame(
        [(30, t1, None)], "doc_id long, text string, op string"),
        3, op_col="op")
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 30]

    # end-to-end through run_stream(op_col=...) on a FRESH store:
    # two microbatches (maxFilesPerTrigger=1) — batch 0 ingests,
    # batch 1 deletes one id and ingests another
    sdir = str(tmp_path / "feed")
    spark.createDataFrame(
        [(50, t1, "upsert"), (51, t2, None)],
        "doc_id long, text string, op string") \
        .coalesce(1).write.parquet(sdir + "/f0")
    spark.createDataFrame(
        [(50, None, "delete"),
         (60, "totally novel words appearing nowhere else", "upsert")],
        "doc_id long, text string, op string") \
        .coalesce(1).write.parquet(sdir + "/f1")
    stream = (spark.readStream
              .schema("doc_id long, text string, op string")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false")
              .parquet(sdir + "/f*"))
    store2 = str(tmp_path / "store2")
    loop2 = IncrementalDedup(spark, store2, "doc_id", "text",
                             auto_compact_tail=None)
    q = loop2.run_stream(stream, op_col="op",
                         checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = sorted(r.doc_id for r in loop2.corpus().collect())
    assert 51 in got and 60 in got and 50 not in got, got


@pytest.mark.parametrize("proto", ["versioned", "actionlog"])
def test_incremental_store_model_based_random_ops(spark, tmp_path,
                                                  proto):
    """Model check for the r9 store: a seeded random interleaving of
    ingest / delete / compact ops against a bare _IndexStore must
    match a dict-based reference model at EVERY step — probe(own) =
    rows whose batch differs from own, minus ids tombstoned at a
    batch >= the row's ingest batch. Compaction (folds, merges,
    tombstone purges, sweeps, pointer versioning) must be INVISIBLE
    to probes; this drives all of them in combination, including
    fold-with-pending-tombstones and post-merge re-ingest.

    Parametrized over BOTH pointer protocols (VERDICT r9 #3): the
    same matrix must hold under the default versioned pointer and the
    Delta-log-emulating action log — proving the commit protocol is
    the only format-specific piece of the store."""
    import random

    from wp_etl_migration_spark.streaming.incremental import (
        ActionLogPointer, VersionedPointer, _IndexStore)
    protocol = (VersionedPointer() if proto == "versioned"
                else ActionLogPointer(checkpoint_every=3))
    rng = random.Random(20260815)
    store = _IndexStore(spark, str(tmp_path / "idx"),
                        "doc_id long, key string", "key",
                        num_subs=8, rows_per_sub=2, max_runs=2,
                        pointer_protocol=protocol)

    model_rows = []     # (id, key, batch)
    model_tombs = []    # (id, tbatch)
    next_id = 0

    def model_probe(own):
        out = set()
        for i, k, b in model_rows:
            if b == own:
                continue
            if any(i == ti and b <= tb for ti, tb in model_tombs):
                continue
            out.add((i, k))
        return out

    live_ids = []
    for batch in range(14):
        op = rng.random()
        if op < 0.55 or not live_ids:
            # ingest 1-3 docs (some keys collide across batches)
            rows = []
            for _ in range(rng.randint(1, 3)):
                did = next_id
                next_id += 1
                key = f"k{rng.randint(0, 9)}"
                rows.append((did, key))
                model_rows.append((did, key, batch))
                live_ids.append(did)
            store.write_batch(
                spark.createDataFrame(rows, "doc_id long, key string"),
                batch)
        elif op < 0.85:
            # delete 1-2 live ids at this batch
            victims = rng.sample(live_ids,
                                 min(len(live_ids), rng.randint(1, 2)))
            store.delete(
                spark.createDataFrame([(v,) for v in victims],
                                      "doc_id long"), batch)
            for v in victims:
                model_tombs.append((v, batch))
                live_ids.remove(v)
        else:
            # compact everything committed so far (serialized here)
            store.compact(batch - 1)
        got = {(r.doc_id, r.key)
               for r in store.probe(batch).collect()}
        assert got == model_probe(batch), (
            batch, sorted(got), sorted(model_probe(batch)))
    # final full compact, then probe from a fresh future batch
    store.compact(13)
    got = {(r.doc_id, r.key) for r in store.probe(99).collect()}
    assert got == model_probe(99)


def test_incremental_dedup_corpus_empty_store(spark, tmp_path):
    """corpus() on an untouched store returns an empty typed frame
    instead of raising — monitoring can poll a loop that has not seen
    its first batch."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    loop = IncrementalDedup(spark, str(tmp_path / "none"),
                            "doc_id", "text")
    df = loop.corpus()
    assert df.count() == 0
    assert df.columns == ["doc_id", "text"]


def test_incremental_dedup_stats(spark, tmp_path):
    """stats() surfaces the store state a monitoring hook needs:
    tail partition counts, committed pointer, live tombstones,
    corpus rows — before any batch, mid-stream, and after deletes
    and compaction."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    loop = IncrementalDedup(spark, str(tmp_path / "s"),
                            "doc_id", "text", num_subs=8,
                            rows_per_sub=1, auto_compact_tail=None)
    s0 = loop.stats()
    assert s0["corpus_rows"] == 0
    assert s0["digests"]["tail_partitions"] == 0
    assert s0["digests"]["pointer"] is None

    loop.process_batch(spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        ["doc_id", "text"]), 0)
    loop.delete([1], 1)
    s1 = loop.stats()
    assert s1["corpus_rows"] == 1
    assert s1["digests"]["tail_partitions"] == 1
    assert s1["digests"]["live_tombstones"] == 1

    loop.compact(1)
    s2 = loop.stats()
    assert s2["digests"]["tail_partitions"] == 0
    assert s2["digests"]["pointer"]["folded_up_to"] == 1
    assert s2["digests"]["pointer"]["tomb_gen"] == 0
    assert s2["corpus_rows"] == 1


def test_incremental_delete_below_fold_rejected(spark, tmp_path):
    """ADVICE r9 (medium): a tombstone written with batch_id <= the
    pointer's folded_up_to is invisible to probes (the tomb tail only
    reads past the fold high-water mark) and the next sweep removes
    its partition outright — for a takedown that is a silent no-op.
    delete() now validates against the pointer and fails loudly; a
    delete past the fold still works."""
    import pytest as _pytest

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    loop = IncrementalDedup(spark, str(tmp_path / "s"),
                            "doc_id", "text", num_subs=8,
                            rows_per_sub=1, auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        ["doc_id", "text"]), 0)
    loop.compact(0)
    assert loop._digest_store.pointer()["folded_up_to"] == 0

    # at the fold mark: rejected (would be silently swept)
    with _pytest.raises(ValueError, match="folded_up_to"):
        loop.delete([1], 0)
    with _pytest.raises(ValueError, match="folded_up_to"):
        loop._digest_store.delete(
            spark.createDataFrame([(1,)], ["doc_id"]), 0)
    # no tombstone partition was left behind by the failed calls
    import os
    assert not os.path.exists(str(tmp_path / "s" / "digests_tombs"))

    # past the fold: the takedown applies normally
    loop.delete([1], 1)
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2}


def test_incremental_corpus_schema_consistent(spark, tmp_path):
    """ADVICE r9: corpus() returns exactly (id, text) in every store
    state — untouched, live, and live-with-tombstones — so consumers
    never see the batch_id partition column leak through."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    loop = IncrementalDedup(spark, str(tmp_path / "s"),
                            "doc_id", "text", num_subs=8,
                            rows_per_sub=1, auto_compact_tail=None)
    assert loop.corpus().columns == ["doc_id", "text"]
    loop.process_batch(spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        ["doc_id", "text"]), 0)
    assert loop.corpus().columns == ["doc_id", "text"]
    loop.delete([1], 1)
    assert loop.corpus().columns == ["doc_id", "text"]
    assert [r.doc_id for r in loop.corpus().collect()] == [2]


def test_purge_corpus_removes_bytes(spark, tmp_path):
    """Physical takedown (VERDICT r9 #2): delete -> purge_corpus ->
    a RAW file scan of the store shows none of the deleted content;
    corpus() is identical before and after; the applied corpus
    tombstones retire; a later re-ingest of the purged content is
    re-admitted; scoped re-ingests already in the corpus survive the
    rewrite."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "s")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1,
                            auto_compact_tail=None)
    secret = "takedown sentinel alpha bravo charlie delta echo"
    keeper = "completely unrelated content one two three four five"
    loop.process_batch(spark.createDataFrame(
        [(1, secret), (2, keeper)], ["doc_id", "text"]), 0)
    loop.delete([1], 1)
    # re-ingest of the SAME content after its tombstone: must survive
    loop.process_batch(spark.createDataFrame(
        [(20, secret)], ["doc_id", "text"]), 2)
    before = sorted(r.doc_id for r in loop.corpus().collect())
    assert before == [2, 20]

    res = loop.purge_corpus()
    assert res["partitions_rewritten"] == 1
    assert res["rows_purged"] == 1
    assert res["tombs_retired"] == 1

    # corpus() identical; the later re-ingest untouched by scoping
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2, 20]
    # the bytes are GONE: raw read of every corpus file
    raw = spark.read.parquet(f"{store}/corpus")
    assert raw.where(F.col("doc_id") == 1).count() == 0
    texts = [r.text for r in raw.collect()]
    assert secret in texts          # the scoped re-ingest's copy
    assert len(texts) == 2
    # file-level sweep: doc 1's partition holds no sentinel bytes
    import glob as _glob
    part0 = _glob.glob(f"{store}/corpus/batch_id=0/*.parquet")
    blob = b"".join(open(p, "rb").read() for p in part0)
    assert b"takedown sentinel" not in blob
    # tombstone record retired; masking path back to the fast path
    import os
    assert not os.path.exists(f"{store}/corpus_tombs") or not [
        d for d in os.listdir(f"{store}/corpus_tombs")
        if d.startswith("batch_id=")]
    # idempotent: a second purge is a no-op
    res2 = loop.purge_corpus()
    assert res2 == {"partitions_rewritten": 0, "rows_purged": 0,
                    "tombs_retired": 0}
    # purged content re-ingests at a later batch like any new doc
    loop.process_batch(spark.createDataFrame(
        [(30, "fresh novel content zeta eta theta iota")],
        ["doc_id", "text"]), 3)
    assert sorted(r.doc_id for r in loop.corpus().collect()) \
        == [2, 20, 30]


def test_purge_corpus_crash_recovery(spark, tmp_path):
    """purge_corpus is crash-idempotent at every swap position: a
    crash after the partition moved to trash but before staging
    swapped in (the lost-partition window) is healed by the recovery
    sweep on the next call — no rows lost, deleted bytes still
    purged."""
    from wp_etl_migration_spark.streaming import incremental as inc
    store = str(tmp_path / "s")
    loop = inc.IncrementalDedup(spark, store, "doc_id", "text",
                                num_subs=8, rows_per_sub=1,
                                auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "secret sentinel alpha bravo"),
         (2, "keeper content one two three")],
        ["doc_id", "text"]), 0)
    loop.delete([1], 1)

    # crash between rename(part->trash) and rename(staging->part)
    real = inc._rename
    calls = {"n": 0}

    def crashy(spark_, src, dst):
        ok = real(spark_, src, dst)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("crash mid-swap")
        return ok

    inc._rename = crashy
    try:
        with pytest.raises(RuntimeError, match="crash mid-swap"):
            loop.purge_corpus()
    finally:
        inc._rename = real
    # the live partition is gone right now — the recovery window
    import os
    assert not os.path.exists(f"{store}/corpus/batch_id=0")

    res = loop.purge_corpus()        # recovery sweep finishes the swap
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2]
    raw = spark.read.parquet(f"{store}/corpus")
    assert raw.where(F.col("doc_id") == 1).count() == 0
    assert not os.path.exists(f"{store}/corpus_purge_trash")
    assert not os.path.exists(f"{store}/corpus_purge_staging")


def test_purge_recovery_aborts_on_failed_rename(spark, tmp_path):
    """A recovery rename that reports failure as False (Hadoop's
    silent mode) must abort recovery loudly and leave the trash copy
    — the only surviving bytes — intact for a retry, in BOTH the
    finish-the-swap and rollback branches (ADVICE r10: an unchecked
    False deleted the original data)."""
    import os

    from wp_etl_migration_spark.streaming import incremental as inc
    store = str(tmp_path / "s")
    loop = inc.IncrementalDedup(spark, store, "doc_id", "text",
                                num_subs=8, rows_per_sub=1,
                                auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "secret sentinel alpha bravo"),
         (2, "keeper content one two three")],
        ["doc_id", "text"]), 0)
    loop.delete([1], 1)

    # crash between rename(part->trash) and rename(staging->part):
    # live partition gone, trash holds the original, staging complete
    real = inc._rename
    calls = {"n": 0}

    def crashy(spark_, src, dst):
        ok = real(spark_, src, dst)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("crash mid-swap")
        return ok

    inc._rename = crashy
    try:
        with pytest.raises(RuntimeError, match="crash mid-swap"):
            loop.purge_corpus()
    finally:
        inc._rename = real
    trash = f"{store}/corpus_purge_trash/batch_id=0"
    assert os.path.exists(trash)

    # finish branch: rename(staging->part) returns False => abort,
    # trash (original bytes) and staging both left for the retry
    inc._rename = lambda *_: False
    try:
        with pytest.raises(RuntimeError, match="purge recovery"):
            loop.purge_corpus()
    finally:
        inc._rename = real
    assert os.path.exists(trash)
    assert os.path.exists(
        f"{store}/corpus_purge_staging/batch_id=0/_SUCCESS")

    # rollback branch: staging incomplete (no _SUCCESS) + rename
    # False => abort, trash still intact
    os.remove(f"{store}/corpus_purge_staging/batch_id=0/_SUCCESS")
    inc._rename = lambda *_: False
    try:
        with pytest.raises(RuntimeError, match="rollback"):
            loop.purge_corpus()
    finally:
        inc._rename = real
    assert os.path.exists(trash)

    # with renames healthy again the retry completes end to end
    loop.purge_corpus()
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [2]
    raw = spark.read.parquet(f"{store}/corpus")
    assert raw.where(F.col("doc_id") == 1).count() == 0
    assert not os.path.exists(f"{store}/corpus_purge_trash")
    assert not os.path.exists(f"{store}/corpus_purge_staging")


def test_action_log_pointer_protocol(spark, tmp_path):
    """The Delta-log-emulating protocol in isolation: commits write
    numbered action files (diffs between states, snapshot every
    checkpoint_every-th), read folds them in order, a torn newest
    file degrades to the previous commit, a diff the fold cannot
    reproduce falls back to a snapshot action, and sweep retains
    everything back to the second-newest snapshot."""
    import json as _json
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        ActionLogPointer)
    base = str(tmp_path / "base")
    p = ActionLogPointer(checkpoint_every=4)
    assert p.read(spark, base) is None

    s0 = {"folded_up_to": 0, "runs": [{"gen": 0, "num_subs": 2}],
          "tomb_gen": None}
    p.commit(spark, base, s0)                 # v0: first => snapshot
    assert p.read(spark, base) == s0
    a0 = _json.loads(open(
        os.path.join(base, "_log", f"{0:020d}.json")).read())
    assert a0 == [{"snapshot": s0}]

    s1 = {"folded_up_to": 3,
          "runs": [{"gen": 0, "num_subs": 2}, {"gen": 1, "num_subs": 1}],
          "tomb_gen": 0}
    p.commit(spark, base, s1)                 # v1: pure diff
    assert p.read(spark, base) == s1
    a1 = _json.loads(open(
        os.path.join(base, "_log", f"{1:020d}.json")).read())
    assert {"add_run": {"gen": 1, "num_subs": 1}} in a1
    assert not any("snapshot" in a for a in a1)

    s2 = {"folded_up_to": 5, "runs": [{"gen": 2, "num_subs": 4}],
          "tomb_gen": None}                   # the merge = OPTIMIZE
    p.commit(spark, base, s2)                 # v2: removes + add
    assert p.read(spark, base) == s2
    a2 = _json.loads(open(
        os.path.join(base, "_log", f"{2:020d}.json")).read())
    assert {"remove_run": 0} in a2 and {"remove_run": 1} in a2

    # a run-list ORDER change a diff cannot express => snapshot
    s3 = {"folded_up_to": 6,
          "runs": [{"gen": 3, "num_subs": 1}, {"gen": 2, "num_subs": 4}],
          "tomb_gen": None}
    p.commit(spark, base, s3)                 # v3
    assert p.read(spark, base) == s3
    a3 = _json.loads(open(
        os.path.join(base, "_log", f"{3:020d}.json")).read())
    assert any("snapshot" in a for a in a3)

    # torn newest file (crashed commit): read degrades to s3
    with open(os.path.join(base, "_log", f"{4:020d}.json"), "w") as fh:
        fh.write('[{"snapshot": {"folded_up')
    assert p.read(spark, base) == s3

    s4 = dict(s3, folded_up_to=9)
    # the torn v4 occupies the version number; the next commit must
    # land past it, not overwrite it silently -- emulate by removing
    # the garbage the way a real recovery would and recommitting
    os.remove(os.path.join(base, "_log", f"{4:020d}.json"))
    p.commit(spark, base, s4)                 # v4 again, checkpoint
    a4 = _json.loads(open(
        os.path.join(base, "_log", f"{4:020d}.json")).read())
    assert any("snapshot" in a for a in a4)   # every 4th = checkpoint
    assert p.read(spark, base) == s4

    # sweep: keeps back to the SECOND-newest snapshot (v0 is older)
    p.sweep(spark, base)
    names = sorted(os.listdir(os.path.join(base, "_log")))
    assert f"{0:020d}.json" not in names      # before 2nd-newest snap
    assert f"{3:020d}.json" in names and f"{4:020d}.json" in names
    assert p.read(spark, base) == s4


def test_incremental_dedup_on_action_log(spark, tmp_path):
    """IncrementalDedup end-to-end (ingest -> dedup -> delete ->
    compact -> re-ingest) on the ActionLogPointer backend: results
    identical to the default protocol, and the base dirs carry a
    _log/ commit directory instead of _CURRENT.v files."""
    import os

    from wp_etl_migration_spark.streaming.incremental import (
        ActionLogPointer, IncrementalDedup)
    store = str(tmp_path / "s")
    loop = IncrementalDedup(
        spark, store, "doc_id", "text", num_subs=8, rows_per_sub=1,
        max_runs=1, auto_compact_tail=None,
        pointer_protocol=ActionLogPointer(checkpoint_every=3))
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    loop.process_batch(spark.createDataFrame(
        [(1, t1), (2, "one two three four five six seven")],
        ["doc_id", "text"]), 0)
    loop.process_batch(spark.createDataFrame(
        [(10, t1)], ["doc_id", "text"]), 1)     # exact dup drops
    assert sorted(r.doc_id for r in loop.corpus().collect()) == [1, 2]
    loop.delete([1], 2)
    loop.process_batch(spark.createDataFrame(
        [(20, t1)], ["doc_id", "text"]), 3)     # re-admitted
    loop.compact(3)
    assert {r.doc_id for r in
            loop._digest_store.probe(99).collect()} == {2, 20}
    ptr = loop._digest_store.pointer()
    assert ptr["folded_up_to"] == 3
    assert os.path.isdir(os.path.join(store, "digests_base", "_log"))
    assert not [n for n in os.listdir(
        os.path.join(store, "digests_base"))
        if n.startswith("_CURRENT")]


def test_corpus_purge_lifecycle_model_based(spark, tmp_path):
    """Model check for the takedown lifecycle (r10): a seeded random
    interleaving of ingest / delete / purge_corpus / compact against
    IncrementalDedup must match a dict model at every step —
    corpus() = ingested rows minus scoped tombstones — and after
    every purge the RAW corpus files must hold exactly the live rows
    (masked bytes physically gone), with corpus() unchanged across
    the purge."""
    import random

    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    rng = random.Random(20260815)
    loop = IncrementalDedup(spark, str(tmp_path / "s"),
                            "doc_id", "text", num_subs=8,
                            rows_per_sub=1, max_runs=2,
                            auto_compact_tail=None)
    rows = []     # (id, ingest_batch)
    tombs = []    # (id, tomb_batch)
    next_id = 0

    def live():
        return {i for i, b in rows
                if not any(i == ti and b <= tb for ti, tb in tombs)}

    for batch in range(12):
        op = rng.random()
        if op < 0.5 or not live():
            docs = []
            for _ in range(rng.randint(1, 3)):
                did = next_id
                next_id += 1
                docs.append((did, f"doc {did} unique words "
                                  f"{'x' * (did % 5 + 1)} {did * 7}"))
                rows.append((did, batch))
            loop.process_batch(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                batch)
        elif op < 0.75:
            victims = rng.sample(sorted(live()),
                                 min(len(live()), rng.randint(1, 2)))
            loop.delete(victims, batch)
            tombs.extend((v, batch) for v in victims)
        elif op < 0.9:
            before = live()
            loop.purge_corpus()
            # purge is storage-only: the view is unchanged, the
            # masked rows are physically gone, tombstones retire
            raw = {r.doc_id for r in spark.read.parquet(
                str(tmp_path / "s" / "corpus")).collect()}
            assert raw == before
            rows[:] = [(i, b) for i, b in rows if i in before]
            tombs.clear()
        else:
            loop.compact(batch - 1)
        got = {r.doc_id for r in loop.corpus().collect()}
        assert got == live(), (batch, sorted(got), sorted(live()))
    # final purge leaves raw files == the live view exactly
    loop.purge_corpus()
    raw = {r.doc_id for r in spark.read.parquet(
        str(tmp_path / "s" / "corpus")).collect()}
    assert raw == live()


def test_action_log_random_commit_sequences(spark, tmp_path):
    """Randomized protocol check: 30 seeded random pointer states
    committed through ActionLogPointer — read() must return exactly
    the last committed state after EVERY commit (whatever mix of
    diff and snapshot commits the heuristic produced), including
    across a sweep."""
    import random

    from wp_etl_migration_spark.streaming.incremental import (
        ActionLogPointer)
    rng = random.Random(20260815)
    base = str(tmp_path / "b")
    p = ActionLogPointer(checkpoint_every=5)
    gens = []
    next_gen = 0
    for step in range(30):
        # evolve a plausible run list: fold adds, merge collapses
        if gens and rng.random() < 0.3:
            gens = [next_gen]          # merge
            next_gen += 1
        else:
            gens = gens + [next_gen]   # fold
            next_gen += 1
        state = {"folded_up_to": step,
                 "runs": [{"gen": g,
                           "num_subs": 1 + g % 4} for g in gens],
                 "tomb_gen": (step % 3) if step % 2 else None}
        p.commit(spark, base, state)
        assert p.read(spark, base) == state, step
        if rng.random() < 0.25:
            p.sweep(spark, base)
            assert p.read(spark, base) == state, ("post-sweep", step)


def test_action_log_crash_at_commit(spark, tmp_path):
    """Crash-at-flip under the ActionLogPointer backend (the format
    claim's crash half): a compact that dies inside the log commit
    leaves the previous committed state — probes unchanged — and the
    retried compact folds idempotently, exactly the VersionedPointer
    contract."""
    from wp_etl_migration_spark.streaming import incremental as inc
    proto = inc.ActionLogPointer(checkpoint_every=3)
    store = inc._IndexStore(spark, str(tmp_path / "idx"),
                            "doc_id long, key string", "key",
                            num_subs=8, rows_per_sub=1, max_runs=2,
                            pointer_protocol=proto)
    store.write_batch(spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, key string"), 0)
    store.write_batch(spark.createDataFrame(
        [(3, "c")], "doc_id long, key string"), 1)

    real = inc.ActionLogPointer.commit

    def boom(self, spark_, base_root, ptr):
        raise RuntimeError("crash at log commit")

    inc.ActionLogPointer.commit = boom
    try:
        with pytest.raises(RuntimeError, match="crash at log commit"):
            store.compact(1)
    finally:
        inc.ActionLogPointer.commit = real
    # previous committed state: no pointer, probes see the tail
    assert store.pointer() is None
    assert {r.doc_id for r in store.probe(99).collect()} == {1, 2, 3}

    store.compact(1)                 # retry folds idempotently
    ptr = store.pointer()
    assert ptr["folded_up_to"] == 1 and len(ptr["runs"]) == 1
    assert {r.doc_id for r in store.probe(99).collect()} == {1, 2, 3}


def test_purge_corpus_prunes_partitions_past_newest_tombstone(
        spark, tmp_path):
    """Behavioral proof of the purge hit-scan's partition prune: a
    corpus partition NEWER than every tombstone is never read — a
    deliberately corrupt parquet file planted there would fail any
    scan that touched it, and the purge must succeed anyway."""
    from wp_etl_migration_spark.streaming.incremental import (
        IncrementalDedup)
    store = str(tmp_path / "s")
    loop = IncrementalDedup(spark, store, "doc_id", "text",
                            num_subs=8, rows_per_sub=1,
                            auto_compact_tail=None)
    loop.process_batch(spark.createDataFrame(
        [(1, "secret sentinel alpha"), (2, "keeper one two")],
        ["doc_id", "text"]), 0)
    loop.delete([1], 1)
    # plant a poison partition ABOVE the newest tombstone (batch 5 >
    # tomb batch 1): unreadable as parquet
    import os
    poison = f"{store}/corpus/batch_id=5"
    os.makedirs(poison)
    with open(f"{poison}/part-poison.parquet", "wb") as fh:
        fh.write(b"not a parquet file at all")

    res = loop.purge_corpus()
    assert res["rows_purged"] == 1 and res["partitions_rewritten"] == 1
    raw = spark.read.parquet(f"{store}/corpus/batch_id=0")
    assert [r.doc_id for r in raw.collect()] == [2]


