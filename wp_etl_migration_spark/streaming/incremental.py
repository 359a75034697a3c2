"""Continuous corpus dedup — the production loop that keeps a growing
corpus duplicate-free as crawl batches stream in.

Each microbatch runs the two incremental batch operators against
on-disk stores and then extends those stores with its survivors:

1. exact pass — ``operators.dedup.cross_corpus_exact_dedup`` against
   the stored one-column DIGEST index (content never re-read);
2. near-dup pass — ``operators.dedup.incremental_lsh_pairs`` against
   the stored (id, band, band_hash) BAND index (corpus text never
   re-shingled); batch docs colliding with the corpus (or an
   earlier-id batch doc) are dropped;
3. survivors append to the corpus store, and their digests/bands
   append to the indexes — the next batch dedups against them.

``foreachBatch`` is the right tool: the per-batch work is plain batch
DataFrame code (same operators, same tests), the streaming engine
supplies exactly-once batch replay via the checkpoint, and the only
unbounded state lives in the appendable parquet stores, not in
executor memory. Idempotency: foreachBatch is at-least-once on retry
*within* a failed batch, so every store is hive-partitioned by
``batch_id`` and written with per-partition OVERWRITE, and both
stored indexes are queried with the batch's own ``batch_id``
excluded (partition-pruned, and precise: an id anti-join would also
exclude an older batch's row sharing the id, breaking dedup of
re-delivered docs) — a retry therefore recomputes the exact survivor
set of the first attempt (the input batch is offset-identical by the
checkpoint contract) and replaces whatever subset of the three
partition writes landed, wherever the crash fell. Plain parquet thus
gets exactly-once STORE STATE; a transactional table format
(Delta/Iceberg via the same ``.write`` calls) remains the
belt-and-braces choice when concurrent readers must never glimpse a
half-written partition.

Index layout — tail + compacted base (r8, VERDICT r7 #3)
--------------------------------------------------------

The per-batch probe is an equi-join against an index that grows with
the corpus; after 10⁵ batches both the full-index scan and the
per-batch partition listing become the bottleneck. Each probe-able
index therefore has TWO parts, managed by :class:`_IndexStore`:

- the **tail**: one plain ``<root>/batch_id=N/`` partition per batch,
  exactly the v2 layout — cheap to write (no extra files per batch),
  authoritative for replay (a retry overwrites its own partition);
- the **base**: a LEVELED list of compacted runs
  ``<root>_base/gen-K/sub=S/``, each hive-partitioned by ``sub =
  pmod(xxhash64(join key), num_subs)`` and named by the atomic
  pointer (``{"folded_up_to": W, "runs": [{"gen": K, "num_subs": M, "rows": R},
  …], "tomb_gen": G|null}``). Run rows RETAIN their original
  ``batch_id`` as a plain column (r9 — it RLE-compresses to nothing
  and buys precise own-batch exclusion plus tombstone scoping, both
  below). Each run's sub COUNT is adaptive: ``ceil(rows /
  rows_per_sub)`` capped at ``num_subs``, recorded per run — a small
  run stays a handful of fat files (no small-file tax), a
  corpus-scale run fans out to the cap, and the probe always hashes
  with each RUN'S recorded modulus, so pruning stays exact across
  recompactions.

``compact(up_to)`` folds tail partitions with ``batch_id <= up_to``
into a NEW run — O(folded tail), not O(store) — and merges all runs
into one only when more than ``max_runs`` would accumulate: the
LSM-style leveling trade (frequent cheap folds, rare full rewrites;
total compaction work O(N·max_runs + N²/(K·max_runs)) over N rows at
cadence K instead of the single-base O(N²/K)). The pointer flip is
the commit point — a crash before it leaves the old pointer and all
sources intact (a rerun redoes the work idempotently); a crash after
it leaves folded tail dirs / unlisted gen dirs as garbage the probe
already ignores (the tail read filters ``batch_id > W``; runs are
read only off the pointer) and the next ``compact`` sweeps. Rows can
never be read twice or lost at any crash position.

The pointer itself is a VERSIONED file family
``<root>_base/_CURRENT.v<N>`` (r9, ADVICE r8): each commit writes a
tmp file and atomically renames it to the next fresh version —
``create(overwrite=True)`` in place is NOT atomic on HDFS/local (the
old bytes truncate before the new land), whereas rename of a
one-block file to a name that does not exist yet is. Readers take
the highest PARSEABLE version, so a crash mid-commit (tmp written,
never renamed — or renamed but empty on an exotic FS) degrades to
the previous committed state instead of a JSONDecodeError wedge.
Sweeps keep the newest TWO versions so a reader that just listed the
directory can still open the version it chose a full compaction
cycle later.

**Concurrency contract** (ADVICE r8): ``compact`` must be SERIALIZED
with the batch body — call it from within ``process_batch`` (what
the default auto-compaction does), between backfill calls, or with
the streaming query stopped/paused. A compact racing an in-flight
batch can delete tail files that batch's lazy plan already listed —
a FileNotFoundException availability failure the checkpoint replay
heals (never corruption, since the replay converges to the same
survivor set), but not one to design in. Exactly one process may
compact a store at a time.

Deletes / takedowns (r9, VERDICT r8 #2)
---------------------------------------

Real corpora shrink: takedown and re-licensing removals must stop
matching dedup probes or the index diverges from the corpus forever.
``delete(ids, batch_id)`` writes a TOMBSTONE partition
``<root>_tombs/batch_id=N/`` (one long id column; per-partition
overwrite = the replay unit, same protocol as data batches — ids
share the store's monotone batch-id space). Semantics: a tombstone
at batch B kills stored rows with the same id ingested at any batch
``<= B`` — immediately at probe time (a scoped broadcast anti-join:
``row.batch_id <= tomb.batch_id``), and physically whenever
compaction rewrites the rows (folds filter folded tail rows; the
full merge filters everything). Scoping is what makes
delete→re-ingest work: a doc re-ingested at a LATER batch than its
tombstone is re-admitted and its new rows never match the old
tombstone. Committed tombstones ride along in the pointer as a
folded ``tombs-gen-G`` dir and are PURGED at the full merge — the
only moment every stored row is guaranteed rewritten-filtered.
Probes on a store with no deletes pay nothing (the tombstone
anti-join is only planned when tombstone files exist). Deletes can
also arrive IN-BAND with the crawl feed (CDC shape):
``process_batch(..., op_col=...)`` / ``run_stream(op_col=...)``
tombstone rows marked ``"delete"`` before the dedup probes run —
same-batch delete+re-ingest of one id resolves delete-wins, later
batches re-admit.

The corpus content store is NOT physically rewritten by ``delete``
(an in-place parquet partition rewrite has no atomic commit to hide
behind, unlike runs, which land in fresh gen dirs under the pointer
flip); :meth:`IncrementalDedup.corpus` reads the corpus minus a
dedicated ``corpus_tombs/`` record whose lifecycle is independent of
the index tombstones (those purge at the full merge once every index
row has been rewritten-filtered — corpus partitions never are by the
batch loop, so their tombstones persist). The physical content purge
is :meth:`IncrementalDedup.purge_corpus` (r10, VERDICT r9 #2): a
crash-idempotent staging→trash→swap rewrite of exactly the hit
partitions, run from the maintenance window on the deployment's own
schedule, retiring ``corpus_tombs/`` with it — takedown compliance
means bytes gone, not filtered.

Auto-compaction (r9, VERDICT r8 #3)
-----------------------------------

By default the stores now compact THEMSELVES: at the end of
``process_batch``, once more than ``auto_compact_tail`` live tail
partitions have accumulated, the wrapper runs ``compact(batch_id -
1)`` — only checkpoint-COMMITTED batches fold (the in-flight batch's
partition stays in the tail, so replay reasoning is untouched), and
the call is serialized with the batch body by construction. The
decision is recorded in the pointer (``"auto": {"at_batch": N,
"tail_parts": T}``) for observability. Set ``auto_compact_tail=None``
to drive compaction manually (the pre-r9 behavior).

Batch ids must be non-negative and, for compaction correctness,
monotone: ``compact(up_to)`` assumes no FUTURE batch will use an id
``<= up_to`` (foreachBatch ids are monotone by contract; backfills
must follow suit).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, uri: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath, jvm


def _write_text(spark: SparkSession, uri: str, text: str) -> None:
    """Small text file through the Hadoop FileSystem API (same-FS as
    the stores — HDFS/S3/local). NOT atomic against readers of the
    same path (create truncates first) — pointer commits therefore
    write a tmp name and :func:`_rename` it to a fresh name."""
    fs, jpath, _ = _hadoop_fs(spark, uri)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, uri: str) -> str | None:
    fs, jpath, jvm = _hadoop_fs(spark, uri)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # Java-side drain: a py4j byte[] argument is COPIED into the
        # JVM, so a Python-side read(buf) loop would never see the
        # bytes; commons-io ships with Spark.
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def _rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic same-FS rename (true on HDFS and the local FS when the
    destination does not exist — the pointer-commit primitive)."""
    fs, jsrc, jvm = _hadoop_fs(spark, src)
    return fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst))


def _delete(spark: SparkSession, uri: str) -> None:
    fs, jpath, _ = _hadoop_fs(spark, uri)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _recover_swaps(spark: SparkSession, live_root: str,
                   stag_root: str, trash_root: str) -> None:
    """Finish or roll back partition swaps a crashed purge left
    behind (shared by the corpus and matches-feed purges). Invariants
    the swap protocol guarantees: a trash entry exists only after its
    staging write completed OR its swap completed, so — trash + live
    partition → the swap finished, drop the trash; trash + no
    partition + complete staging → finish the swap; trash + no
    partition + incomplete staging → roll the original back. Stale
    staging dirs (no trash peer) are always safe to drop: the rewrite
    re-derives them."""
    fs, jtrash, jvm = _hadoop_fs(spark, trash_root)
    jpath = jvm.org.apache.hadoop.fs.Path
    if fs.exists(jtrash):
        for st in fs.listStatus(jtrash):
            name = st.getPath().getName()
            part = f"{live_root}/{name}"
            stag = f"{stag_root}/{name}"
            if fs.exists(jpath(part)):
                fs.delete(st.getPath(), True)
            elif fs.exists(jpath(f"{stag}/_SUCCESS")):
                # Hadoop rename reports failure as False (same silent
                # mode _swap_partition guards). An unchecked finish
                # would delete the trash copy — the only surviving
                # bytes — so abort loudly and leave trash+staging
                # intact for a retry.
                if not _rename(spark, stag, part):
                    raise RuntimeError(
                        f"purge recovery: rename staging -> {part} "
                        "failed; leaving trash and staging for retry")
                fs.delete(st.getPath(), True)
            else:
                if not _rename(spark, f"{trash_root}/{name}", part):
                    raise RuntimeError(
                        f"purge recovery: rollback trash -> {part} "
                        "failed; leaving trash for retry")
        # every entry is now resolved; drop the root too, so a crash
        # on the very last trash delete leaves zero residue after
        # recovery (a later purge may return early on no-tombstones
        # and never reach its own root cleanup)
        if not fs.listStatus(jtrash):
            fs.delete(jtrash, True)
    _delete(spark, stag_root)


def _swap_partition(spark: SparkSession, survivors: DataFrame,
                    part: str, stag: str, trash_root: str,
                    trash: str) -> None:
    """One crash-safe partition rewrite: survivors land in staging
    (the write's ``_SUCCESS`` marker witnesses completeness), the
    live partition renames to trash (atomic), staging renames into
    place (atomic), trash deletes. Any crash position is healed by
    :func:`_recover_swaps` on the next call."""
    survivors.write.mode("overwrite").parquet(stag)
    fs, _, jvm = _hadoop_fs(spark, stag)
    jpath = jvm.org.apache.hadoop.fs.Path
    if not fs.exists(jpath(f"{stag}/_SUCCESS")):
        raise RuntimeError(
            f"purge staging write for {part} left no _SUCCESS "
            "marker; aborting before the swap")
    # Hadoop rename needs the destination parent and reports failure
    # as False — surface both loudly (a silent false would delete
    # nothing and loop forever believing it had).
    fs.mkdirs(jpath(trash_root))
    if not _rename(spark, part, trash):
        raise RuntimeError(f"purge: rename {part} -> trash failed")
    if not _rename(spark, stag, part):
        raise RuntimeError(f"purge: rename staging -> {part} failed")
    _delete(spark, trash)


class PointerProtocol:
    """The commit protocol behind a store's base state — the piece a
    transactional table format (Delta, Iceberg) provides natively.
    BASELINE.md §r8 claims the store layout "maps 1:1 onto
    Delta/Iceberg (runs = files, pointer = log, merge = OPTIMIZE)";
    this interface is that claim as code (VERDICT r9 #3): the runs are
    already immutable generation dirs (= data files), the ONLY
    format-specific piece is how the base state commits, and the store
    test matrix passes under both shipped protocols. A deployment on a
    real transactional format implements these three methods with the
    format's own commit primitive and changes nothing else.

    Contract (single writer, serialized with the batch body):

    - ``read`` returns the last COMMITTED state or None; a commit that
      crashed mid-write must degrade to the previous state, never
      raise or return torn bytes;
    - ``commit`` atomically publishes ``ptr`` as the new state;
    - ``sweep`` garbage-collects protocol files a racing reader can no
      longer need (data-file GC is the store's own job)."""

    def read(self, spark: SparkSession, base_root: str) -> dict | None:
        raise NotImplementedError

    def commit(self, spark: SparkSession, base_root: str,
               ptr: dict) -> None:
        raise NotImplementedError

    def sweep(self, spark: SparkSession, base_root: str) -> None:
        raise NotImplementedError


class VersionedPointer(PointerProtocol):
    """The default protocol (r9, ADVICE r8): each commit writes the
    FULL state JSON to a tmp name and renames it to the next fresh
    ``_CURRENT.v<N>`` (atomic on HDFS/local); readers take the highest
    parseable version, so a torn newest file degrades to the previous
    commit. In Delta terms every commit is a checkpoint."""

    def _versions(self, spark, base_root: str) -> list[int]:
        fs, jbase, _ = _hadoop_fs(spark, base_root)
        if not fs.exists(jbase):
            return []
        out = []
        for status in fs.listStatus(jbase):
            name = status.getPath().getName()
            if name.startswith("_CURRENT.v"):
                try:
                    out.append(int(name[len("_CURRENT.v"):]))
                except ValueError:
                    pass
        return sorted(out)

    def read(self, spark, base_root):
        for v in sorted(self._versions(spark, base_root), reverse=True):
            text = _read_text(
                spark, os.path.join(base_root, f"_CURRENT.v{v}"))
            if not text:
                continue
            try:
                return json.loads(text)
            except ValueError:
                continue
        return None

    def commit(self, spark, base_root, ptr):
        vs = self._versions(spark, base_root)
        v = (vs[-1] + 1) if vs else 0
        tmp = os.path.join(base_root, f"_CURRENT.tmp-{v}")
        _write_text(spark, tmp, json.dumps(ptr))
        dst = os.path.join(base_root, f"_CURRENT.v{v}")
        if not _rename(spark, tmp, dst):
            raise IOError(f"pointer commit rename failed: {dst}")

    def sweep(self, spark, base_root):
        """Stale versions (all but the newest TWO, so a racing
        reader's listed choice outlives one full compaction cycle)
        and leftover tmp files."""
        fs, jbase, _ = _hadoop_fs(spark, base_root)
        if not fs.exists(jbase):
            return
        keep = set(self._versions(spark, base_root)[-2:])
        for status in fs.listStatus(jbase):
            name = status.getPath().getName()
            if name.startswith("_CURRENT.v"):
                try:
                    v = int(name[len("_CURRENT.v"):])
                except ValueError:
                    continue
                if v not in keep:
                    fs.delete(status.getPath(), True)
            elif name.startswith("_CURRENT.tmp-"):
                fs.delete(status.getPath(), True)


class ActionLogPointer(PointerProtocol):
    """Delta-log-emulating protocol: commits are numbered JSON files
    ``_log/<%020d>.json`` each holding a list of ACTIONS —
    ``add_run`` / ``remove_run`` / ``set`` (scalars) / ``snapshot``
    (a full-state checkpoint) — and the state is the in-order FOLD of
    the actions since the latest snapshot, exactly Delta's
    add/remove-file log with periodic checkpoints (runs = files,
    commit diff = AddFile/RemoveFile actions, the full merge =
    OPTIMIZE: remove every old run, add one). Every
    ``checkpoint_every``-th commit is a snapshot so the fold — and
    the log the sweep must retain — stays bounded.

    Commit computes the action diff old→new and VERIFIES the fold of
    (old state + diff) reproduces the new state bit-for-bit, falling
    back to a snapshot action when it cannot (e.g. a run-list
    reordering a diff can't express) — correctness never depends on
    the diff heuristic. Same crash contract as VersionedPointer:
    tmp+rename per log file; a torn newest file is ignored."""

    def __init__(self, checkpoint_every: int = 10):
        self.checkpoint_every = int(checkpoint_every)

    def _log_dir(self, base_root: str) -> str:
        return os.path.join(base_root, "_log")

    def _versions(self, spark, base_root: str) -> list[int]:
        fs, jlog, _ = _hadoop_fs(spark, self._log_dir(base_root))
        if not fs.exists(jlog):
            return []
        out = []
        for status in fs.listStatus(jlog):
            name = status.getPath().getName()
            if name.endswith(".json") and not name.startswith("tmp-"):
                try:
                    out.append(int(name[:-len(".json")]))
                except ValueError:
                    pass
        return sorted(out)

    def _read_actions(self, spark, base_root: str,
                      v: int) -> list | None:
        text = _read_text(spark, os.path.join(
            self._log_dir(base_root), f"{v:020d}.json"))
        if not text:
            return None
        try:
            acts = json.loads(text)
            return acts if isinstance(acts, list) else None
        except ValueError:
            return None

    @staticmethod
    def _fold(state: dict | None, actions: list) -> dict | None:
        for act in actions:
            if "snapshot" in act:
                state = (None if act["snapshot"] is None
                         else dict(act["snapshot"]))
                continue
            if state is None:
                state = {"folded_up_to": -1, "runs": [],
                         "tomb_gen": None}
            if "add_run" in act:
                state["runs"] = list(state["runs"]) + [act["add_run"]]
            elif "remove_run" in act:
                state["runs"] = [r for r in state["runs"]
                                 if int(r["gen"]) != int(act["remove_run"])]
            elif "set" in act:
                state = {**state, **act["set"]}
        return state

    def read(self, spark, base_root):
        vs = self._versions(spark, base_root)
        # a torn/unparseable file can only be the newest (single
        # writer, tmp+rename) — the parse filter drops it, degrading
        # to the previous commit
        parsed: list[tuple[int, list]] = []
        for v in vs:
            acts = self._read_actions(spark, base_root, v)
            if acts is not None:
                parsed.append((v, acts))
        # fold from the latest snapshot commit
        start = 0
        for i in range(len(parsed) - 1, -1, -1):
            if any("snapshot" in a for a in parsed[i][1]):
                start = i
                break
        state: dict | None = None
        for _, acts in parsed[start:]:
            state = self._fold(state, acts)
        return state

    def commit(self, spark, base_root, ptr):
        vs = self._versions(spark, base_root)
        v = (vs[-1] + 1) if vs else 0
        old = self.read(spark, base_root)
        if old is None or v % self.checkpoint_every == 0:
            actions: list = [{"snapshot": ptr}]
        else:
            old_gens = {int(r["gen"]): r for r in old["runs"]}
            new_gens = {int(r["gen"]): r for r in ptr["runs"]}
            actions = [{"remove_run": g} for g in old_gens
                       if g not in new_gens]
            actions += [{"add_run": r} for g, r in new_gens.items()
                        if g not in old_gens]
            scalars = {k: val for k, val in ptr.items() if k != "runs"}
            actions.append({"set": scalars})
            if self._fold(dict(old, runs=list(old["runs"])),
                          actions) != ptr:
                actions = [{"snapshot": ptr}]     # diff can't express it
        log_dir = self._log_dir(base_root)
        fs, jlog, _ = _hadoop_fs(spark, log_dir)
        fs.mkdirs(jlog)
        tmp = os.path.join(log_dir, f"tmp-{v:020d}.json")
        _write_text(spark, tmp, json.dumps(actions))
        dst = os.path.join(log_dir, f"{v:020d}.json")
        if not _rename(spark, tmp, dst):
            raise IOError(f"log commit rename failed: {dst}")

    def sweep(self, spark, base_root):
        """Drop log files older than the SECOND-newest snapshot (the
        newest-two retention of VersionedPointer, applied to
        checkpoint boundaries) and leftover tmp files."""
        fs, jlog, _ = _hadoop_fs(spark, self._log_dir(base_root))
        if not fs.exists(jlog):
            return
        snaps = []
        for v in self._versions(spark, base_root):
            acts = self._read_actions(spark, base_root, v)
            if acts is not None and any("snapshot" in a for a in acts):
                snaps.append(v)
        floor = snaps[-2] if len(snaps) >= 2 else (
            snaps[-1] if snaps else None)
        for status in fs.listStatus(jlog):
            name = status.getPath().getName()
            if name.startswith("tmp-"):
                fs.delete(status.getPath(), True)
            elif name.endswith(".json") and floor is not None:
                try:
                    v = int(name[:-len(".json")])
                except ValueError:
                    continue
                if v < floor:
                    fs.delete(status.getPath(), True)


class _IndexStore:
    """One probe-able incremental index: per-batch tail partitions
    plus a LEVELED list of compacted sub-bucketed runs, plus an
    optional tombstone set (module docstring).

    ``columns`` is the stored schema WITHOUT batch_id/sub (e.g.
    ``"doc_id long, digest string"``); its FIRST column is the row id
    tombstones key on. ``key_col`` names the join-key column whose
    hash defines each run's ``sub`` partition; ``max_runs`` bounds
    how many compacted runs may accumulate before they merge into
    one."""

    def __init__(self, spark: SparkSession, root: str, columns: str,
                 key_col: str, num_subs: int,
                 rows_per_sub: int = 1_000_000, max_runs: int = 4,
                 pointer_protocol: PointerProtocol | None = None):
        self.spark = spark
        self.root = root
        self.columns = columns
        self.key_col = key_col
        self.id_col = columns.split(",")[0].split()[0]
        self.num_subs = int(num_subs)          # per-run sub cap
        self.rows_per_sub = int(rows_per_sub)  # adaptive target
        self.max_runs = int(max_runs)
        self._proto = pointer_protocol or VersionedPointer()

    # -- sub bucketing ---------------------------------------------------
    def sub(self, col, num_subs: int) -> Column:
        return F.pmod(F.xxhash64(col), F.lit(int(num_subs))).cast("int")

    def _subs_of(self, df: DataFrame, col, num_subs: int) -> list[int]:
        """Distinct sub-buckets of a batch-side key column under one
        run's modulus — a driver collect bounded by that constant."""
        return [r[0] for r in
                df.select(self.sub(col, num_subs).alias("__s"))
                .distinct().collect()]

    # -- pointer -----------------------------------------------------------
    @property
    def _base_root(self) -> str:
        return self.root + "_base"

    @property
    def _tombs_root(self) -> str:
        return self.root + "_tombs"

    def pointer(self) -> dict | None:
        """``{"folded_up_to": W, "runs": [{"gen": K, "num_subs": M, "rows": R},
        ...], "tomb_gen": G|None}`` — the committed base state, or
        None before the first compaction, read through the store's
        :class:`PointerProtocol` (default :class:`VersionedPointer`;
        a crashed commit degrades to the previous committed state
        instead of raising under every protocol)."""
        return self._proto.read(self.spark, self._base_root)

    def _write_pointer(self, ptr: dict) -> None:
        """Atomic pointer commit through the protocol (single-writer
        by the compact contract)."""
        self._proto.commit(self.spark, self._base_root, ptr)

    def runs(self) -> list[dict]:
        ptr = self.pointer()
        return list(ptr["runs"]) if ptr else []

    # -- read paths --------------------------------------------------------
    def _cols(self) -> list[str]:
        return [c.split()[0] for c in self.columns.split(",")]

    def _read_tail(self) -> DataFrame:
        """All tail partitions (schema + batch_id), or empty before the
        first append. Probed by attempting the read (not os.path) so
        the stores can live on any Hadoop filesystem."""
        from pyspark.errors import AnalysisException
        schema = self.columns + ", batch_id int"
        try:
            df = self.spark.read.schema(schema).parquet(self.root)
            df.schema  # force path resolution now, inside the try
            return df
        except AnalysisException:
            return self.spark.createDataFrame([], schema)

    def _read_run(self, run: dict) -> DataFrame:
        return self.spark.read \
            .schema(self.columns + ", batch_id int, sub int") \
            .parquet(os.path.join(self._base_root,
                                  f"gen-{int(run['gen'])}"))

    def _read_tomb_tail(self) -> DataFrame | None:
        """Tombstone tail partitions as (id, batch_id), or None when
        no delete was ever issued (the no-deletes fast path — probes
        then plan no anti-join at all)."""
        fs, jt, _ = _hadoop_fs(self.spark, self._tombs_root)
        if not fs.exists(jt):
            return None
        return self.spark.read \
            .schema(f"{self.id_col} long, batch_id int") \
            .parquet(self._tombs_root)

    def _tombstones(self, ptr: dict | None) -> DataFrame | None:
        """All LIVE tombstones as ``(__tomb_id, __tomb_batch)``: the
        pointer's folded tombs-gen plus tomb tail partitions past the
        fold high-water mark. None when none exist."""
        folded = int(ptr["folded_up_to"]) if ptr else -1
        parts = []
        tail = self._read_tomb_tail()
        if tail is not None:
            parts.append(tail.filter(F.col("batch_id") > folded))
        gen = ptr.get("tomb_gen") if ptr else None
        if gen is not None:
            parts.append(self.spark.read
                         .schema(f"{self.id_col} long, batch_id int")
                         .parquet(os.path.join(
                             self._base_root,
                             f"tombs-gen-{int(gen)}")))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select(F.col(self.id_col).alias("__tomb_id"),
                          F.col("batch_id").alias("__tomb_batch"))

    def _anti_tombs(self, df: DataFrame,
                    tombs: DataFrame | None) -> DataFrame:
        """Scoped tombstone filter: drop rows whose id is tombstoned
        at a batch >= the row's ingest batch (``df`` must carry
        ``batch_id``). A re-ingest under a LATER batch id than the
        tombstone survives — the delete→re-ingest contract. The
        tombstone side is broadcast: bounded by deletes since the
        last full merge, never by corpus size."""
        if tombs is None:
            return df
        return df.join(
            F.broadcast(tombs),
            (F.col(self.id_col) == F.col("__tomb_id"))
            & (F.col("batch_id") <= F.col("__tomb_batch")),
            "left_anti")

    def probe_parts(self, own_batch_id: int) -> tuple[
            DataFrame, list[tuple[dict, DataFrame]], dict | None]:
        """:meth:`probe`'s constituents BEFORE sub pruning, tombstone
        filtering, and the union — ``(tail, [(run, frame)], ptr)`` —
        for callers that keep per-run caches (r12: the ANN loop's
        prepared-base cache; gen dirs are write-once, so a run's
        frame is cacheable keyed by its gen number alone). The tail
        is filtered past the fold mark and minus the batch's own
        ``batch_id``; run frames are returned BATCH-AGNOSTIC (no
        own-batch filter — a cache must not bake one batch's
        exclusion in; callers apply it per batch, as :meth:`probe`
        does). Both carry ``batch_id``; run frames also ``sub``."""
        cols = self._cols()
        ptr = self.pointer()
        folded = int(ptr["folded_up_to"]) if ptr else -1
        tail = (self._read_tail()
                .filter(F.col("batch_id") > folded)
                .filter(F.col("batch_id") != int(own_batch_id))
                .select(*cols, "batch_id"))
        runs = [(run, self._read_run(run).select(*cols, "batch_id",
                                                 "sub"))
                for run in (ptr["runs"] if ptr else [])]
        return tail, runs, ptr

    def probe(self, own_batch_id: int, key_df: DataFrame | None = None,
              key_col=None) -> DataFrame:
        """The queryable index for a batch: every compacted run ∪ the
        tail, with the batch's OWN ``batch_id`` excluded everywhere
        (runs retain row batch ids) and folded-into-base partitions
        excluded from the tail. With ``(key_df, key_col)`` given,
        each run is pruned to the batch keys' sub-buckets under THAT
        RUN'S recorded modulus (one bounded driver collect per run;
        runs ≤ max_runs) — exact, since ``sub`` is a pure function of
        the join key. Tombstoned rows are filtered by a scoped
        broadcast anti-join (planned only when deletes exist).
        Returns ``columns`` only."""
        cols = self._cols()
        tail, runs, ptr = self.probe_parts(own_batch_id)
        out = tail
        for run, base in runs:
            if key_df is not None and int(run["num_subs"]) > 1:
                subs = self._subs_of(key_df, key_col,
                                     int(run["num_subs"]))
                base = base.filter(F.col("sub").isin(subs))
            out = out.unionByName(
                base.filter(F.col("batch_id") != int(own_batch_id))
                .drop("sub"))
        out = self._anti_tombs(out, self._tombstones(ptr))
        return out.select(*cols)

    # -- write paths ---------------------------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """Overwrite this batch's tail partition (the replay unit)."""
        df.write.mode("overwrite").parquet(
            os.path.join(self.root, f"batch_id={int(batch_id)}"))

    def delete(self, ids: DataFrame, batch_id: int) -> None:
        """Tombstone ``ids`` (a one-column frame named/castable to the
        store's id column): stored rows with these ids ingested at any
        batch ``<= batch_id`` stop matching probes immediately and are
        physically purged as compaction rewrites their runs
        (committed tombstones themselves drop out at the full merge).
        ``batch_id`` shares the store's monotone id space and must be
        >= the ingest batches it targets; a re-ingest of a deleted id
        must use a LATER batch id and is then re-admitted.
        Per-partition overwrite = the replay unit, exactly the
        ``write_batch`` protocol.

        Raises ``ValueError`` when ``batch_id`` is at or below the
        pointer's ``folded_up_to``: tombstones there are invisible to
        probes (``_tombstones`` only reads the tail past the fold
        high-water mark) and the next sweep would remove the partition
        outright — for a takedown that would be a silent no-op, so
        misuse fails loudly instead."""
        ptr = self.pointer()
        folded = int(ptr["folded_up_to"]) if ptr else -1
        if int(batch_id) <= folded:
            raise ValueError(
                f"delete batch_id={int(batch_id)} is <= the store's "
                f"folded_up_to={folded}; tombstones must use a batch id "
                "past the fold high-water mark (same monotone id space "
                "as write_batch) or the takedown silently no-ops")
        (ids.selectExpr(f"cast({ids.columns[0]} as long) "
                        f"as {self.id_col}")
         .distinct().write.mode("overwrite")
         .parquet(os.path.join(self._tombs_root,
                               f"batch_id={int(batch_id)}")))

    def _committed_tombs(self, ptr: dict | None,
                         up_to: int) -> tuple[DataFrame | None, int]:
        """Tombstones committed through ``up_to`` as an (id, batch_id)
        frame, plus how many are NEWLY folded this compaction (tail
        tombstones in (folded, up_to] — a driver count bounded by
        deletes, skipped when no tombstone files exist)."""
        folded = int(ptr["folded_up_to"]) if ptr else -1
        parts, n_new = [], 0
        tail = self._read_tomb_tail()
        if tail is not None:
            fresh = tail.filter((F.col("batch_id") > folded)
                                & (F.col("batch_id") <= int(up_to)))
            n_new = fresh.count()
            if n_new:
                parts.append(fresh)
        gen = ptr.get("tomb_gen") if ptr else None
        if gen is not None:
            parts.append(self.spark.read
                         .schema(f"{self.id_col} long, batch_id int")
                         .parquet(os.path.join(
                             self._base_root,
                             f"tombs-gen-{int(gen)}")))
        if not parts:
            return None, 0
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out, n_new

    def tail_batch_count(self) -> int:
        """Live tail partitions (batch dirs past the fold high-water
        mark) — the auto-compaction trigger metric. One directory
        listing, no data read."""
        ptr = self.pointer()
        folded = int(ptr["folded_up_to"]) if ptr else -1
        fs, jroot, _ = _hadoop_fs(self.spark, self.root)
        if not fs.exists(jroot):
            return 0
        n = 0
        for status in fs.listStatus(jroot):
            name = status.getPath().getName()
            if not name.startswith("batch_id="):
                continue
            try:
                if int(name.split("=", 1)[1]) > folded:
                    n += 1
            except ValueError:
                continue
        return n

    def compact(self, up_to: int, _note: dict | None = None) -> None:
        """Fold tail partitions with ``batch_id <= up_to`` into a NEW
        compacted run — O(folded tail), not O(store) — and, when that
        would leave more than ``max_runs`` runs, merge everything into
        one (the amortized leveling trade: frequent cheap folds, rare
        full rewrites). Folded rows are filtered against committed
        tombstones (scoped on row batch id); the full merge filters
        EVERY stored row and therefore also purges the committed
        tombstone set. Pointer flip = commit point; idempotent at any
        crash position (module docstring). No future batch may use an
        id <= ``up_to``, and the call must be serialized with the
        batch body (module docstring — what auto-compaction
        guarantees by construction). ``_note`` is recorded in the
        pointer under ``"auto"`` for cadence observability."""
        from wp_etl_migration_spark.operators.checkpoint import pin
        ptr = self.pointer()
        runs_old = list(ptr["runs"]) if ptr else []
        folded_old = int(ptr["folded_up_to"]) if ptr else -1
        tomb_gen_old = ptr.get("tomb_gen") if ptr else None
        if up_to <= folded_old:
            return
        # Garbage from a crashed prior run (pointer flipped, deletes
        # not finished): folded tail dirs and unlisted gen dirs are
        # already invisible to probes — remove them first so the fold
        # below cannot double-read them.
        self._sweep(folded_old, {int(r["gen"]) for r in runs_old},
                    tomb_gen_old)
        cols = self._cols()
        keep = cols + ["batch_id"]
        new = self._read_tail() \
            .filter((F.col("batch_id") > folded_old)
                    & (F.col("batch_id") <= int(up_to))) \
            .select(*keep)
        merge = len(runs_old) + 1 > self.max_runs
        if merge:
            for run in runs_old:
                new = new.unionByName(self._read_run(run).select(*keep))
        tombs, n_new_tombs = self._committed_tombs(ptr, up_to)
        if tombs is not None:
            new = self._anti_tombs(
                new,
                tombs.select(F.col(self.id_col).alias("__tomb_id"),
                             F.col("batch_id").alias("__tomb_batch")))
        new = pin(new)
        n_rows = new.count()
        if n_rows == 0 and not merge:
            # Nothing to fold: just advance the high-water mark.
            runs_new = runs_old
        else:
            # Adaptive sub count: one ~rows_per_sub-row file per sub,
            # up to the cap — a small run stays a handful of fat files
            # (no small-file tax), a corpus-scale run fans out for
            # pruning. (A single hot join key concentrates in one sub
            # whatever the modulus; stored-index hot keys are bounded
            # upstream — survivors are deduped and hot candidate
            # buckets are capped — so the residual skew is one
            # modest-straggler write task, not a plan hazard.)
            subs_new = max(1, min(self.num_subs,
                                  -(-n_rows // self.rows_per_sub)))
            gen_new = max((int(r["gen"]) for r in runs_old),
                          default=-1) + 1
            (new.withColumn("sub",
                            self.sub(F.col(self.key_col), subs_new))
             .repartition("sub")
             .write.partitionBy("sub").mode("overwrite")
             .parquet(os.path.join(self._base_root, f"gen-{gen_new}")))
            # fold-time row count rides in the pointer so a fresh
            # process can budget its prepared cache without one cold
            # count() job per live gen (ADVICE r13). Physical purges
            # can later shrink a run below this figure — the budget
            # then under-admits, never over-admits.
            added = {"gen": gen_new, "num_subs": int(subs_new),
                     "rows": int(n_rows)}
            runs_new = [added] if merge else runs_old + [added]
        # Tombstone fold: the merge filtered every stored row, so the
        # committed set is purged outright; otherwise newly committed
        # tombstones fold (with the old set) into a fresh tombs-gen —
        # older runs still hold rows they must mask. No new
        # tombstones ⇒ the old gen carries over untouched.
        if merge:
            tomb_gen_new = None
        elif tombs is None or n_new_tombs == 0:
            tomb_gen_new = tomb_gen_old
        else:
            tomb_gen_new = (int(tomb_gen_old) + 1
                            if tomb_gen_old is not None else 0)
            (tombs.distinct().write.mode("overwrite")
             .parquet(os.path.join(self._base_root,
                                   f"tombs-gen-{tomb_gen_new}")))
        ptr_new = {"folded_up_to": int(up_to), "runs": runs_new,
                   "tomb_gen": tomb_gen_new}
        if _note:
            ptr_new["auto"] = _note
        self._write_pointer(ptr_new)
        # Post-commit cleanup; a crash here leaves garbage the next
        # compact (or this sweep on rerun) removes.
        self._sweep(int(up_to), {int(r["gen"]) for r in runs_new},
                    tomb_gen_new)

    def _sweep(self, up_to: int, keep_gens: set[int],
               tomb_keep_gen: int | None) -> None:
        """Delete folded tail partitions (batch_id <= up_to), base and
        tombstone generation dirs the pointer no longer lists, and —
        via the protocol's own ``sweep`` — stale pointer/log files
        (each protocol keeps enough history that a racing reader's
        listed choice outlives one full compaction cycle)."""
        fs, jroot, _ = _hadoop_fs(self.spark, self.root)
        if fs.exists(jroot):
            for status in fs.listStatus(jroot):
                name = status.getPath().getName()
                if not name.startswith("batch_id="):
                    continue
                try:
                    bid = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if bid <= up_to:
                    fs.delete(status.getPath(), True)
        fs, jtombs, _ = _hadoop_fs(self.spark, self._tombs_root)
        if fs.exists(jtombs):
            live = 0
            for status in fs.listStatus(jtombs):
                name = status.getPath().getName()
                if not name.startswith("batch_id="):
                    continue
                try:
                    bid = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if bid <= up_to:
                    fs.delete(status.getPath(), True)
                else:
                    live += 1
            if live == 0 and tomb_keep_gen is None:
                # Fully purged: drop the dir so probes return to the
                # no-deletes fast path (no anti-join planned at all).
                fs.delete(jtombs, True)
        fs, jbase, _ = _hadoop_fs(self.spark, self._base_root)
        if fs.exists(jbase):
            for status in fs.listStatus(jbase):
                name = status.getPath().getName()
                if name.startswith("gen-"):
                    try:
                        gen = int(name[len("gen-"):])
                    except ValueError:
                        continue
                    if gen not in keep_gens:
                        fs.delete(status.getPath(), True)
                elif name.startswith("tombs-gen-"):
                    try:
                        gen = int(name[len("tombs-gen-"):])
                    except ValueError:
                        continue
                    if tomb_keep_gen is None or gen != int(tomb_keep_gen):
                        fs.delete(status.getPath(), True)
            self._proto.sweep(self.spark, self._base_root)


def _ids_frame(spark: SparkSession, ids, id_col: str) -> DataFrame:
    """Accept a one-column DataFrame or a plain id list."""
    if isinstance(ids, DataFrame):
        return ids
    return spark.createDataFrame([(int(i),) for i in ids],
                                 f"{id_col} long")


class IncrementalDedup:
    """Stateful wrapper owning the three stores under ``store_dir``:
    ``corpus/`` (surviving docs, hive-partitioned by ``batch_id``)
    and the two probe-able indexes ``digests/`` (id, md5) and
    ``bands/`` (id, band, band_hash), each a tail of per-batch
    partitions plus an optional compacted sub-bucketed base — see the
    module docstring for the layout, probe-pruning, tombstones, and
    the compaction contract. Compaction runs AUTOMATICALLY from
    within ``process_batch`` once the tail exceeds
    ``auto_compact_tail`` partitions (set None to call
    ``compact(up_to)`` manually from a maintenance hook — serialized
    with the batch body, with the last checkpoint-committed batch
    id).

    Store format note: r9 — runs retain ``batch_id``, the pointer is
    versioned, tombstones exist. Not mixable with the r8 or older
    layouts — use a fresh ``store_dir``."""

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str, text_col: str,
                 n: int = 3, num_hashes: int = 16,
                 rows_per_band: int = 2,
                 max_bucket: int | None = None,
                 num_subs: int = 256,
                 rows_per_sub: int = 1_000_000, max_runs: int = 4,
                 auto_compact_tail: int | None = 8,
                 pointer_protocol: PointerProtocol | None = None):
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_hashes = n, num_hashes
        self.rows_per_band = rows_per_band
        self.max_bucket = max_bucket
        self.num_subs = int(num_subs)
        self.rows_per_sub = int(rows_per_sub)
        self.max_runs = int(max_runs)
        self.auto_compact_tail = auto_compact_tail
        self.pointer_protocol = pointer_protocol

    def _path(self, name: str) -> str:
        return os.path.join(self.store_dir, name)

    @property
    def _digest_store(self) -> _IndexStore:
        return _IndexStore(self.spark, self._path("digests"),
                           f"{self.id_col} long, digest string",
                           "digest", self.num_subs,
                           self.rows_per_sub, self.max_runs,
                           pointer_protocol=self.pointer_protocol)

    @property
    def _band_store(self) -> _IndexStore:
        return _IndexStore(
            self.spark, self._path("bands"),
            f"{self.id_col} long, band int, band_hash string",
            "band_hash", self.num_subs, self.rows_per_sub,
            self.max_runs, pointer_protocol=self.pointer_protocol)

    def compact(self, up_to: int, _note: dict | None = None) -> None:
        """Fold both index tails through ``up_to`` into their bases.
        Only pass batch ids the checkpoint has committed; no future
        batch may reuse an id <= ``up_to``; serialize with the batch
        body (module docstring)."""
        self._digest_store.compact(up_to, _note)
        self._band_store.compact(up_to, _note)

    def delete(self, ids, batch_id: int) -> None:
        """Takedown/re-licensing removal: tombstone ``ids`` (a
        one-column frame or plain list) in BOTH probe indexes — their
        digests and bands stop matching immediately, so re-ingested
        identical content is re-admitted at any later batch; physical
        index purge happens at compaction (module docstring).
        ``batch_id`` shares the monotone data-batch id space and must
        be >= the ingest batches it targets. Corpus CONTENT is
        masked by :meth:`corpus` through a THIRD tombstone record
        (``corpus_tombs/``) with an independent lifecycle: the index
        stores purge their tombstones at the full merge (every index
        row is rewritten-filtered there), but corpus partitions are
        never rewritten by the batch loop, so corpus tombstones
        persist until :meth:`purge_corpus` physically rewrites the
        hit partitions and retires both."""
        df = _ids_frame(self.spark, ids, self.id_col)
        self._digest_store.delete(df, batch_id)
        self._band_store.delete(df, batch_id)
        (df.selectExpr(f"cast({df.columns[0]} as long) "
                       f"as {self.id_col}")
         .distinct().write.mode("overwrite")
         .parquet(self._path(f"corpus_tombs/batch_id={int(batch_id)}")))

    def corpus(self) -> DataFrame:
        """The live corpus: surviving docs minus tombstoned ids
        (scoped — a re-ingest under a later batch id than its
        tombstone is visible). This is the read path consumers should
        use once deletes are in play; the physical content purge is
        :meth:`purge_corpus` (which also retires the
        ``corpus_tombs/`` record). Masking
        uses the corpus's OWN tombstone record — index-store
        tombstones purge at the full merge, corpus content does
        not. Always returns exactly the two columns (id, text) — the
        ``batch_id`` partition column is projected away so consumers
        see one schema regardless of store state; an untouched store
        reads as an empty two-column frame rather than raising."""
        from pyspark.errors import AnalysisException
        dstore = self._digest_store
        cols = [self.id_col, self.text_col]
        try:
            df = self.spark.read.parquet(self._path("corpus"))
            df.schema
        except AnalysisException:
            return self.spark.createDataFrame(
                [], f"{self.id_col} long, {self.text_col} string")
        troot = self._path("corpus_tombs")
        fs, jt, _ = _hadoop_fs(self.spark, troot)
        if not fs.exists(jt):
            return df.select(*cols)
        tombs = (self.spark.read
                 .schema(f"{self.id_col} long, batch_id int")
                 .parquet(troot)
                 .select(F.col(self.id_col).alias("__tomb_id"),
                         F.col("batch_id").alias("__tomb_batch")))
        return dstore._anti_tombs(df, tombs).select(*cols)

    # -- physical corpus purge (VERDICT r9 #2) ---------------------------
    def _purge_recover(self) -> None:
        """Crash-recovery sweep for :meth:`purge_corpus`
        (:func:`_recover_swaps` over the corpus swap roots)."""
        _recover_swaps(self.spark, self._path("corpus"),
                       self._path("corpus_purge_staging"),
                       self._path("corpus_purge_trash"))

    def purge_corpus(self) -> dict:
        """Physical takedown (VERDICT r9 #2): rewrite every corpus
        partition that still HOLDS tombstoned content so the deleted
        bytes are gone from disk, then retire the applied
        ``corpus_tombs/`` records — masking and storage now agree.
        :meth:`corpus` results are identical before and after; this is
        a compliance op, not a semantic one. Run it from the same
        maintenance window as :meth:`compact` (single writer,
        serialized with the batch body; only checkpoint-committed
        batches may be on disk).

        Per affected partition P (only partitions with ``P <= some
        tombstone batch`` that actually CONTAIN a tombstoned id — one
        scoped semi-join decides; later re-ingests are untouched):

        1. survivors land in ``corpus_purge_staging/batch_id=P``
           (the write's ``_SUCCESS`` marker witnesses completeness);
        2. the live partition renames to
           ``corpus_purge_trash/batch_id=P`` (atomic);
        3. staging renames into place (atomic);
        4. trash deletes.

        Crash-idempotent: every call starts with a recovery sweep
        (:meth:`_purge_recover`) that finishes or rolls back an
        interrupted swap, so no crash position loses a partition or
        resurrects deleted content past a completed step 3. Scale
        shape: tombstones broadcast (bounded by pending deletes, the
        existing ``_anti_tombs`` premise); only hit partitions are
        rewritten; the partition list is a bounded driver collect.
        Returns ``{"partitions_rewritten", "rows_purged",
        "tombs_retired"}``."""
        self._purge_recover()
        out = {"partitions_rewritten": 0, "rows_purged": 0,
               "tombs_retired": 0}
        troot = self._path("corpus_tombs")
        corpus_root = self._path("corpus")
        fs, jt, jvm = _hadoop_fs(self.spark, troot)
        jpath = jvm.org.apache.hadoop.fs.Path
        if not fs.exists(jt) or not fs.exists(jpath(corpus_root)):
            return out
        tomb_parts = [st.getPath().getName() for st in fs.listStatus(jt)
                      if st.getPath().getName().startswith("batch_id=")]
        if not tomb_parts:
            return out
        tombs = (self.spark.read
                 .schema(f"{self.id_col} long, batch_id int")
                 .parquet(troot)
                 .select(F.col(self.id_col).alias("__tomb_id"),
                         F.col("batch_id").alias("__tomb_batch")))
        # Static partition prune for the hit scan: a tombstone at B
        # only targets partitions <= B, so partitions past the newest
        # tombstone — on a long-running store, almost all of them —
        # are never read (the join's batch_id <= __tomb_batch bound
        # can't be pushed to the scan; this literal filter can).
        max_tomb = max(int(n.split("=", 1)[1]) for n in tomb_parts)
        corpus = (self.spark.read.parquet(corpus_root)
                  .where(F.col("batch_id") <= max_tomb))
        hits = (corpus.join(
                    F.broadcast(tombs),
                    (F.col(self.id_col) == F.col("__tomb_id"))
                    & (F.col("batch_id") <= F.col("__tomb_batch")),
                    "left_semi")
                .groupBy("batch_id").agg(F.count("*").alias("n"))
                .collect())
        for row in sorted(hits, key=lambda r: int(r["batch_id"])):
            p = int(row["batch_id"])
            part = f"{corpus_root}/batch_id={p}"
            stag = self._path(f"corpus_purge_staging/batch_id={p}")
            trash = self._path(f"corpus_purge_trash/batch_id={p}")
            scoped = (tombs.where(F.col("__tomb_batch") >= p)
                      .select("__tomb_id").distinct())
            _swap_partition(
                self.spark,
                self.spark.read.parquet(part)
                .join(F.broadcast(scoped),
                      F.col(self.id_col) == F.col("__tomb_id"),
                      "left_anti"),
                part, stag, self._path("corpus_purge_trash"), trash)
            out["partitions_rewritten"] += 1
            out["rows_purged"] += int(row["n"])
        # every snapshotted tombstone is now fully applied (it targets
        # only batches <= its own id, all rewritten or hit-free)
        for name in tomb_parts:
            _delete(self.spark, f"{troot}/{name}")
        _delete(self.spark, self._path("corpus_purge_staging"))
        _delete(self.spark, self._path("corpus_purge_trash"))
        out["tombs_retired"] = len(tomb_parts)
        return out

    def stats(self) -> dict:
        """Operational snapshot of the three stores: per-index tail
        partition count, committed pointer state (folded high-water,
        run list, tombstone gen, last auto-compaction note), live
        tombstone count, and live corpus rows. Directory listings +
        one count job per index — cheap enough for a monitoring
        hook."""
        out: dict = {"corpus_rows": self.corpus().count()}
        for name, store in (("digests", self._digest_store),
                            ("bands", self._band_store)):
            ptr = store.pointer()
            tombs = store._tombstones(ptr)
            out[name] = {
                "tail_partitions": store.tail_batch_count(),
                "pointer": ptr,
                "live_tombstones":
                    0 if tombs is None else tombs.count(),
            }
        return out

    def _maybe_auto_compact(self, batch_id: int) -> None:
        k = self.auto_compact_tail
        if not k or batch_id <= 0:
            return
        n = self._digest_store.tail_batch_count()
        if n > int(k):
            # Fold only checkpoint-COMMITTED batches: the in-flight
            # batch's partition stays in the tail, so a replay of it
            # finds the store exactly as the first attempt did.
            self.compact(int(batch_id) - 1,
                         _note={"at_batch": int(batch_id),
                                "tail_parts": int(n)})

    def process_batch(self, batch: DataFrame, batch_id: int = 0,
                      op_col: str | None = None) -> None:
        """The foreachBatch body: dedup ``batch`` against the stores,
        write the survivors' three partitions. Safe to call directly
        for batch backfills — give each backfill batch a DISTINCT,
        monotone ``batch_id`` (it keys the per-store ``batch_id=N``
        partition).

        ``op_col`` enables IN-BAND deletes (a CDC-shaped takedown
        feed): rows whose ``op_col`` equals ``"delete"`` tombstone
        their ids (exactly :meth:`delete` at this ``batch_id``) and
        every other row ingests. Tombstones land BEFORE the dedup
        probes run, so content deleted in this batch neither blocks
        nor matches this batch's ingests. Contract: a delete applies
        to content ingested at or before ITS OWN batch — same-batch
        delete+re-ingest of the same id resolves to DELETE WINS
        (there is no intra-batch ordering); re-ingest in any LATER
        batch is re-admitted. Replay-safe: an identical replayed
        batch re-derives the identical delete set and overwrites the
        same tombstone partitions.

        Replay-safe at any crash position: both stored indexes are
        queried with the batch's OWN ``batch_id=N`` rows excluded
        (partition-pruned in the tail, batch-column-filtered in the
        runs — precise, unlike an id anti-join, which would also
        exclude an OLDER batch's row that happens to share an id), so
        a retry after a partial write recomputes exactly the first
        attempt's survivor set (the batch content is
        offset-identical under the foreachBatch checkpoint contract)
        and the per-partition overwrites replace whichever of the
        three writes landed — store rows can neither duplicate nor be
        lost. Because only the batch's own rows are excluded, a doc
        RE-DELIVERED under the same id in a later batch (new
        ``batch_id``, not a checkpoint replay) dedups normally against
        its stored older copy: identical content drops in the exact
        pass, near-identical content drops in the LSH pass — the
        corpus cannot accumulate one id per delivery. Only a same-id
        re-delivery whose content is genuinely DIFFERENT (no exact or
        near match) lands twice, under two batch_id partitions — an
        upstream id-assignment bug this layer preserves rather than
        silently merges.

        Ends with the auto-compaction check (``auto_compact_tail``):
        compaction therefore runs serialized with the batch body, the
        contract ADVICE r8 asks for."""
        from wp_etl_migration_spark.operators.checkpoint import pin
        from wp_etl_migration_spark.operators.dedup import (
            content_digest, cross_corpus_exact_dedup,
            incremental_lsh_pairs, lsh_bands)
        id_c, text_c = self.id_col, self.text_col

        batch = pin(batch)
        if op_col is not None:
            dels = batch.where(F.col(op_col) == "delete") \
                .select(id_c)
            if dels.head(1):
                self.delete(dels, batch_id)
            batch = pin(batch
                        .where(F.col(op_col).isNull()
                               | (F.col(op_col) != "delete"))
                        .drop(op_col))
        # Exact pass against the stored digest index (empty store ⇒
        # pure in-batch dedup); historical corpus text is never
        # re-read. When a compacted base exists the probe prunes to
        # the batch's own digest sub-buckets — rows elsewhere cannot
        # equi-join. The subs collect is skipped entirely in the
        # tail-only regime (it would prune nothing).
        digests = self._digest_store.probe(
            batch_id, batch, content_digest([text_c]))
        exact = cross_corpus_exact_dedup(batch, digests, id_c,
                                         [text_c],
                                         corpus_digest_col="digest")

        # Near-dup pass against the band index, same exclusions and
        # pruning; colliding batch docs (vs corpus, or vs a smaller-id
        # batch doc) drop. The batch's bands are materialized ONCE —
        # the sub collect, the candidate join, and the survivors'
        # band write below all reuse the pinned frame instead of
        # re-running the shingle+signature pass.
        bstore = self._band_store
        new_bands = pin(lsh_bands(exact, id_c, text_c, self.n,
                                  self.num_hashes, self.rows_per_band))
        band_index = bstore.probe(batch_id, new_bands,
                                  F.col("band_hash"))
        pairs = incremental_lsh_pairs(
            exact, band_index, id_c, text_c, self.n, self.num_hashes,
            self.rows_per_band, max_bucket=self.max_bucket,
            _bands=new_bands)
        # Drop convention keeps the smallest id: a batch doc colliding
        # with the corpus always drops (it IS id_new), but a new x new
        # pair arrives as (id_new < id_other), so the LARGER id_other
        # is the one to drop.
        losers = (pairs.select(
            F.when(F.col("other_is_new"), F.col("id_other"))
            .otherwise(F.col("id_new")).alias(id_c)).distinct())
        # Pin before the three writes: survivors is read 3x and its
        # lineage includes the stores being written — without the
        # pin the later writes could re-scan a store mid-mutation.
        survivors = pin(exact.join(losers, id_c, "left_anti"))

        survivors.drop("__digest").write.mode("overwrite") \
            .parquet(self._path(f"corpus/batch_id={int(batch_id)}"))
        self._digest_store.write_batch(
            survivors.select(F.col(id_c).cast("long"),
                             F.col("__digest").alias("digest")),
            batch_id)
        # Survivor bands are a subset of the pinned batch bands — a
        # semi-join, not a second signature pass.
        bstore.write_batch(
            new_bands.join(survivors.select(id_c), id_c, "left_semi")
            .select(F.col(id_c).cast("long"),
                    F.col("band").cast("int"), "band_hash"),
            batch_id)
        self._maybe_auto_compact(batch_id)

    def run_stream(self, stream: DataFrame,
                   checkpoint_dir: str | None = None,
                   available_now: bool = True,
                   op_col: str | None = None):
        """Attach to a streaming frame via foreachBatch. Returns the
        started query (caller awaits/stops). ``op_col`` routes rows
        marked ``"delete"`` to in-band tombstones (see
        :meth:`process_batch`)."""
        body = self.process_batch if op_col is None else (
            lambda df, bid: self.process_batch(df, bid, op_col=op_col))
        writer = (stream.writeStream
                  .foreachBatch(body)
                  .option("checkpointLocation",
                          checkpoint_dir
                          or self._path("_checkpoint")))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class IncrementalAnnIndex:
    """Continuous embedding-space maintenance — the stored-ANN-index
    twin of :class:`IncrementalDedup` (the embedding-side of the
    digest/band pattern above; index layout from
    ``operators.similarity.build_ann_index``).

    Each microbatch:

    1. queries the stored int8 index for its top-k nearest corpus
       neighbors (``operators.similarity.query_ann_index``) — corpus
       FLOAT vectors are never touched and earlier batches are never
       re-bucketed/re-quantized; the stored (id, bucket, qvec, scale)
       rows are reused as-is;
    2. writes the match rows (query_id, neighbor_id, sim, rank) to
       its ``matches/batch_id=N`` partition — the continuous
       near-neighbor feed a semantic-dedup or retrieval loop consumes;
    3. writes the batch's OWN index rows to its ``ann/batch_id=N``
       partition, so the next batch searches this one.

    A batch's vectors are indexed only after it is queried, so matches
    are strictly cross-batch/backward (no self-matches), mirroring the
    smallest-id-wins convention of the text loop. Replay safety: BOTH
    stores are hive-partitioned by ``batch_id`` and written with
    per-partition overwrite, and queries run against the index minus
    the batch's own rows — a foreachBatch retry (at-least-once)
    recomputes identical frames and replaces whichever partition
    writes landed, so match and index rows can neither duplicate nor
    be lost whatever the crash position (see :meth:`process_batch`).
    Batch-precise exclusion (not an id anti-join) also means a vector
    re-delivered under the same id in a LATER batch is indexed again
    under its new batch and still gets its match partition written —
    the index key is ``(batch_id, id)``; consumers that assume unique
    ids must dedupe upstream.

    The ``ann/`` index is a tail + compacted sub-bucketed base like
    the text indexes (module docstring) with ``sub =
    pmod(xxhash64(bucket), num_subs)``; the probe prunes the base to
    the subs of the batch's PROBED buckets — with ``n_probes > 1``
    (the multi-probe recall lever, same knob as ``query_ann_index``)
    the sub set expands to cover every flipped-bit bucket each query
    searches, so pruning stays exact at any probe count. ``matches/``
    stays ``batch_id``-only (it is a feed, never probed by key).
    :meth:`delete` tombstones vector ids out of the probe-able index
    (module docstring); already-written match-feed rows that
    reference a deleted id are history — feed consumers filter.
    Compaction runs automatically from ``process_batch`` once the
    tail exceeds ``auto_compact_tail`` partitions (None = manual).
    Store format is r9 (versioned pointer, run batch ids,
    tombstones) — not mixable with older layouts; use a fresh
    ``store_dir``.
    """

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str, vec_col: str,
                 planes: list | None = None, k: int = 5,
                 rescore: str = "arrow", num_subs: int = 256,
                 rows_per_sub: int = 1_000_000, n_probes: int = 1,
                 max_runs: int = 4,
                 auto_compact_tail: int | None = 8,
                 tables: int = 1, bits: int = 8,
                 pointer_protocol: PointerProtocol | None = None,
                 cache_prepared_base: bool = True,
                 max_prepared_bytes: int | None = None):
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.vec_col = id_col, vec_col
        self.planes, self.k, self.rescore = planes, k, rescore
        self.num_subs = int(num_subs)
        self.rows_per_sub = int(rows_per_sub)
        self.n_probes = int(n_probes)
        self.max_runs = int(max_runs)
        self.auto_compact_tail = auto_compact_tail
        self.pointer_protocol = pointer_protocol
        #: r12 (the bulk-batch index-scan term, BASELINE.md §r11): a
        #: bulk batch probes every sub, so each batch used to re-scan,
        #: re-dequantize, and re-norm the ENTIRE compacted base —
        #: ≈2 s/batch of stationary-soak slope. Compacted runs are
        #: write-once per gen, so their prepared (dequantized+normed)
        #: frames are persisted once per gen and reused until
        #: compaction retires the gen (see ``_prepared_queryable``).
        #: The flag is the kill switch for memory-constrained rigs —
        #: results are bit-identical either way.
        self.cache_prepared_base = bool(cache_prepared_base)
        #: Byte budget for the prepared cache (r12 follow-up): the
        #: prepared frames are float64 lanes — ~4–8× the stored qvec
        #: bytes — so an unbounded cache on a 100 TB fleet trades the
        #: per-batch dequantize for executor storage without limit,
        #: and the all-or-nothing flag above was the only lever.
        #: With a budget, the LARGEST live gens are cached until the
        #: estimated prepared size (:meth:`_prepared_row_bytes` ×
        #: rows) would exceed it; the rest are prepared lazily per
        #: batch (the pre-cache path — bit-identical, just re-paid).
        #: Largest-first because a gen's per-batch saving and its
        #: footprint both scale with its rows (value per byte is
        #: flat, so cached rows are what counts) and big gens
        #: amortize the fixed per-frame overhead best; it is a
        #: greedy, not an exact subset-sum fill (a budget of 100
        #: rows over runs of 60/50/50 caches 60, not 100 — leveled
        #: compaction keeps run sizes far apart, so the gap is
        #: marginal in practice). ``None`` = unbounded (no row-count
        #: jobs are run at all on that path). Cold-start cost (ADVICE
        #: r12): the row-count memo normally fills inside the fold
        #: spike (the prewarm's materializing count doubles as the
        #: memo), but a FRESH process resuming over an existing store
        #: has a cold memo — with a budget set, its first batch pays
        #: one ``count()`` job per live gen (cheap parquet
        #: count-from-metadata scans, but inside that batch's query
        #: wall) before the memo takes over. Empty (0-row) gens are
        #: never selected — nothing to cache.
        self.max_prepared_bytes = (None if max_prepared_bytes is None
                                   else int(max_prepared_bytes))
        self._prepared_cache: dict[int, DataFrame] = {}
        self._gen_rows: dict[int, int] = {}
        #: tables > 1 stores T independent plane sets side by side
        #: (``planes`` becomes a list of T sets; the stored rows gain
        #: a ``table`` column) — the ROUTING recall lever for
        #: neighbors >= 2 sign flips away, where multi-probe plateaus;
        #: bits=16 lifts the int8 RESCORE ceiling (the two recall
        #: caps are measured separately in BASELINE.md §r9).
        self.tables = int(tables)
        self.bits = int(bits)
        if planes is not None:
            # fail at CONSTRUCTION, not at the first batch, on a
            # degenerate caller-supplied plane family (VERDICT r12
            # #2 — the rank-2 trap; query/build validate too, but a
            # continuous loop should refuse before any store exists)
            from wp_etl_migration_spark.operators.similarity import (
                _plane_tables)
            _plane_tables(planes, self.tables)

    def _path(self, name: str) -> str:
        return os.path.join(self.store_dir, name)

    @property
    def _ann_store(self) -> _IndexStore:
        table_col = "table int, " if self.tables > 1 else ""
        # key_col stays the bucket STRING: `sub` is a pure function of
        # the join key's bucket part, so pruning to the probed-bucket
        # subs (unioned across tables) remains exact — a row outside
        # them cannot equi-join on (table, bucket) either.
        return _IndexStore(
            self.spark, self._path("ann"),
            f"{self.id_col} long, {table_col}bucket string, "
            "qvec array<int>, scale double",
            "bucket", self.num_subs, self.rows_per_sub,
            self.max_runs, pointer_protocol=self.pointer_protocol)

    def compact(self, up_to: int, _note: dict | None = None) -> None:
        """Fold the ann tail through ``up_to`` into its base. Only
        pass checkpoint-committed batch ids; no future batch may
        reuse an id <= ``up_to``; serialize with the batch body
        (module docstring)."""
        self._ann_store.compact(up_to, _note)

    def delete(self, ids, batch_id: int) -> None:
        """Tombstone vector ids out of the probe-able index: later
        batches stop matching them immediately; physical purge at
        compaction. A re-ingest of the id at a later batch is indexed
        and matchable again. Historical ``matches/`` feed rows are
        not rewritten by this call — consumers filter until
        :meth:`purge_matches` rewrites them on the compliance
        schedule."""
        self._ann_store.delete(
            _ids_frame(self.spark, ids, self.id_col), batch_id)

    def stats(self) -> dict:
        """Operational snapshot of the ANN loop (r10 — observability
        parity with :meth:`IncrementalDedup.stats`): index tail
        partition count, committed pointer state, live tombstone
        count, and total match-feed rows. Directory listings + one
        count job — cheap enough for a monitoring hook."""
        from pyspark.errors import AnalysisException
        store = self._ann_store
        ptr = store.pointer()
        tombs = store._tombstones(ptr)
        try:
            feed = self.spark.read.parquet(self._path("matches"))
            feed.schema
            match_rows = feed.count()
        except AnalysisException:
            match_rows = 0
        return {
            "match_rows": match_rows,
            "ann": {
                "tail_partitions": store.tail_batch_count(),
                "pointer": ptr,
                "live_tombstones":
                    0 if tombs is None else tombs.count(),
                # prepared-cache occupancy (r12): which gens hold a
                # persisted dequantized frame, and the same size
                # estimate max_prepared_bytes budgets against (known
                # only for gens that were counted — i.e. budgeted
                # runs; unbudgeted loops report rows they happen to
                # know, without launching count jobs here).
                "prepared_gens": sorted(self._prepared_cache),
                "prepared_est_bytes": sum(
                    self._gen_rows[g] * self._prepared_row_bytes()
                    for g in self._prepared_cache
                    if g in self._gen_rows),
            },
        }

    def purge_matches(self, ids) -> dict:
        """Physically rewrite every ``matches/`` feed partition that
        references a deleted vector id on EITHER side (r10 — the
        embedding twin of :meth:`IncrementalDedup.purge_corpus`):
        index rows purge at compaction, but the match feed is
        append-only history, so takedown compliance needs this
        explicit rewrite. ``ids`` is the takedown id set (a one-column
        frame or list — the caller owns it; index tombstones purge at
        the full merge, so the store cannot reconstruct it).

        Same crash-idempotent staging→trash→swap protocol as the
        corpus purge (recovery sweep first; only hit partitions
        rewritten; the id set broadcasts, the partition list is a
        bounded driver collect; surviving rows are untouched).
        Unscoped by design: the feed row (q, n, sim) REFERENCES the
        deleted vector whichever batch wrote it — a re-ingested id's
        future matches land in later partitions written after this
        call. Returns ``{"partitions_rewritten", "rows_purged"}``."""
        live = self._path("matches")
        stag_root = self._path("matches_purge_staging")
        trash_root = self._path("matches_purge_trash")
        _recover_swaps(self.spark, live, stag_root, trash_root)
        out = {"partitions_rewritten": 0, "rows_purged": 0}
        fs, jlive, jvm = _hadoop_fs(self.spark, live)
        if not fs.exists(jlive):
            return out
        tombs = (_ids_frame(self.spark, ids, self.id_col)
                 .selectExpr(f"cast({self.id_col} as long) "
                             "as __tomb_id").distinct())
        feed = self.spark.read.parquet(live)
        hit = (feed.join(F.broadcast(tombs),
                         F.col("query_id") == F.col("__tomb_id"),
                         "left_semi").select("batch_id")
               .unionByName(
                   feed.join(F.broadcast(tombs),
                             F.col("neighbor_id") == F.col("__tomb_id"),
                             "left_semi").select("batch_id"))
               .distinct().collect())
        for row in sorted(int(r["batch_id"]) for r in hit):
            part = f"{live}/batch_id={row}"
            stag = f"{stag_root}/batch_id={row}"
            trash = f"{trash_root}/batch_id={row}"
            pdf = self.spark.read.parquet(part)
            n_before = pdf.count()
            survivors = (pdf.join(F.broadcast(tombs),
                                  F.col("query_id")
                                  == F.col("__tomb_id"), "left_anti")
                         .join(F.broadcast(tombs),
                               F.col("neighbor_id")
                               == F.col("__tomb_id"), "left_anti"))
            _swap_partition(self.spark, survivors, part, stag,
                            trash_root, trash)
            out["partitions_rewritten"] += 1
            out["rows_purged"] += n_before - self.spark.read \
                .parquet(part).count()
        _delete(self.spark, stag_root)
        _delete(self.spark, trash_root)
        return out

    def _maybe_auto_compact(self, batch_id: int) -> None:
        k = self.auto_compact_tail
        if not k or batch_id <= 0:
            return
        n = self._ann_store.tail_batch_count()
        if n > int(k):
            self.compact(int(batch_id) - 1,
                         _note={"at_batch": int(batch_id),
                                "tail_parts": int(n)})

    def _prepared_run(self, run: dict, base: DataFrame) -> DataFrame:
        """The (possibly cached) prepared frame for one compacted run;
        builds + persists it on first sight of the gen."""
        from pyspark import StorageLevel

        from wp_etl_migration_spark.operators.similarity import (
            prepare_ann_index)
        gen = int(run["gen"])
        df = self._prepared_cache.get(gen)
        if df is None:
            df = prepare_ann_index(
                base, self.id_col, self.planes,
                tables=self.tables).persist(
                    StorageLevel.MEMORY_AND_DISK)
            self._prepared_cache[gen] = df
        return df

    def _prepared_row_bytes(self) -> int:
        """Estimated in-memory bytes of ONE prepared-frame row: the
        dequantized double lanes dominate (dims × 8), plus a fixed
        allowance for the scalar columns (neighbor_id, bucket, __cn,
        sub, batch_id[, table]) and array headers. A budget lever
        sized to the dominant term, not an exact JVM meter — the
        columnar cached form adds per-batch overhead the estimate
        deliberately ignores."""
        from wp_etl_migration_spark.operators.similarity import (
            _plane_tables)
        dims = len(_plane_tables(self.planes, self.tables)[0][0])
        return dims * 8 + 48

    def _sync_prepared_cache(self, runs, ptr) -> set[int]:
        """Reconcile the per-gen cache with the live pointer and the
        byte budget; returns the gens that SHOULD be cached. Evicts
        retired gens and gens the budget no longer admits (a new
        larger gen can displace a smaller cached one); prunes the
        row-count memo of dead gens. With no budget every live gen is
        selected and no count jobs run."""
        live = {int(r["gen"]) for r in (ptr["runs"] if ptr else [])}
        if self.max_prepared_bytes is None:
            selected = live
        else:
            sized = []
            for run, base in runs:
                gen = int(run["gen"])
                if gen not in self._gen_rows:
                    # pointer-recorded fold-time count when present
                    # (ADVICE r13 — fresh processes used to pay one
                    # cold count() job per live gen); legacy pointers
                    # without it still count once and memoize
                    self._gen_rows[gen] = (int(run["rows"])
                                           if "rows" in run
                                           else base.count())
                sized.append((self._gen_rows[gen], gen))
            sized.sort(reverse=True)
            bpr = self._prepared_row_bytes()
            selected, budget = set(), self.max_prepared_bytes
            for rows, gen in sized:
                # rows == 0 would fit ANY budget (0·bpr ≤ 0) but an
                # empty run has nothing worth a persist slot — skip
                # (ADVICE r12).
                if rows and rows * bpr <= budget:
                    selected.add(gen)
                    budget -= rows * bpr
        for gen in [g for g in self._prepared_cache
                    if g not in selected]:
            self._prepared_cache.pop(gen).unpersist()
        for gen in [g for g in self._gen_rows if g not in live]:
            del self._gen_rows[gen]
        return selected

    def _prewarm_prepared_cache(self) -> None:
        """Materialize prepared frames for uncached selected gens NOW
        and evict retired / budget-displaced ones. persist() is lazy,
        so without this the first batch after a compaction — possibly
        a 10-vector trickle — would absorb the whole base's
        dequantize + persist inside its own wall; running it at the
        end of the fold batch keeps that cost inside the
        already-amortized fold spike (compaction is serialized with
        the batch body, so the pointer read here is the post-fold
        one)."""
        store = self._ann_store
        _tail, runs, ptr = store.probe_parts(-1)
        selected = self._sync_prepared_cache(runs, ptr)
        for run, base in runs:
            gen = int(run["gen"])
            if gen in selected and gen not in self._prepared_cache:
                n = self._prepared_run(run, base).count()
                # the materializing count doubles as the size memo,
                # so unbudgeted loops get stats() byte estimates for
                # free (still zero DEDICATED count jobs)
                self._gen_rows.setdefault(gen, int(n))

    def _prepared_queryable(self, store: _IndexStore, batch_id: int,
                            probed: DataFrame) -> DataFrame:
        """The queryable index in :func:`prepare_ann_index` shape,
        with the compacted runs served from the per-gen prepared
        cache (r12 — the bulk-batch lever): each run is dequantized +
        normed ONCE when its gen first appears, persisted
        (MEMORY_AND_DISK — spills, never recomputes against a swept
        gen dir unless evicted while still live, in which case the
        dir still exists), and reused until compaction retires the
        gen, at which point it is unpersisted here. The tail (≤
        ``auto_compact_tail`` batch partitions, bounded) is prepared
        fresh each batch. Per-batch work on the cached runs is only
        the sub prune, the scoped tombstone anti-join, and the
        probed-bucket semi-join inside ``query_ann_index`` — the
        CodegenFallback dequantize and the norm fold are no longer
        re-paid per batch. Under ``max_prepared_bytes``, gens the
        budget excludes are prepared lazily here instead
        (unpersisted — the pre-cache cost shape, bit-identical
        results)."""
        from wp_etl_migration_spark.operators.similarity import (
            prepare_ann_index)
        tail, runs, ptr = store.probe_parts(batch_id)
        selected = self._sync_prepared_cache(runs, ptr)
        parts = [prepare_ann_index(tail, self.id_col, self.planes,
                                   tables=self.tables)]
        for run, base in runs:
            df = (self._prepared_run(run, base)
                  if int(run["gen"]) in selected
                  else prepare_ann_index(base, self.id_col,
                                         self.planes,
                                         tables=self.tables))
            if int(run["num_subs"]) > 1:
                subs = store._subs_of(probed, F.col("__bucket"),
                                      int(run["num_subs"]))
                df = df.filter(F.col("sub").isin(subs))
            # Own-batch exclusion applied per batch, never baked
            # into the cached frame (defensive — runs hold only
            # folded batch ids, all < a live batch's id).
            parts.append(df.filter(F.col("batch_id")
                                   != int(batch_id)).drop("sub"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        tombs = store._tombstones(ptr)
        if tombs is not None:
            # The scoped tombstone contract (_anti_tombs) on the
            # prepared frame's renamed id column.
            out = out.join(
                F.broadcast(tombs),
                (F.col("neighbor_id") == F.col("__tomb_id"))
                & (F.col("batch_id") <= F.col("__tomb_batch")),
                "left_anti")
        return out.drop("batch_id")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """The foreachBatch body: query the stored index minus the
        batch's own ``ann/batch_id=N`` rows, overwrite the batch's
        match partition, then overwrite its index partition. Safe to
        call directly for batch backfills — pass each backfill batch
        a DISTINCT, monotone ``batch_id`` (it keys both per-batch
        partitions; reusing an id overwrites that batch's rows, which
        is exactly the replay semantics).

        Requires ``planes`` (a maintenance-only construction with
        ``planes=None`` supports stats/delete/compact/purge_matches,
        which never touch the routing planes — the stats CLI's
        shape — but cannot ingest or query).

        Replay-safe at any crash position (foreachBatch is
        at-least-once): the querying index excludes the batch's own
        rows — precise even when a LATER batch re-delivers an
        already-indexed id, where the old id anti-join both shrank the
        queryable index and (when every id was already indexed)
        short-circuited without writing the match partition at all —
        so a retry after a partial ``ann/batch_id=N`` write still
        scores the full batch strictly backward, and both
        per-partition overwrites replace whatever the crashed attempt
        left behind. No short-circuit is needed: a fully-committed
        replay recomputes and overwrites byte-identical partitions.

        Ends with the auto-compaction check (``auto_compact_tail``) —
        compaction serialized with the batch body."""
        from wp_etl_migration_spark.operators.checkpoint import pin
        from wp_etl_migration_spark.operators.similarity import (
            _plane_tables, build_ann_index, plane_dots,
            probe_buckets_from_dots, query_ann_index)
        if self.planes is None:
            raise ValueError(
                "this IncrementalAnnIndex was constructed without "
                "planes (maintenance-only); ingest/query needs the "
                "fixed plane set used at build time")
        store = self._ann_store
        batch = pin(batch)
        sets = _plane_tables(self.planes, self.tables)
        # Probe pruning: a query joins only stored rows sharing one of
        # its PROBED buckets (own bucket + n_probes−1 flipped-bit
        # buckets per table — the same expansion query_ann_index
        # applies), so compacted-base subs outside that set can never
        # match; with tables > 1 the probed-bucket set is the UNION
        # over tables (sub hashes the bucket string only — exact,
        # slightly over-inclusive across tables). The probed buckets
        # are exploded batch-side before hashing; the collect stays
        # bounded by the base's sub modulus. Skipped in the tail-only
        # regime (nothing to prune). The plane dots are materialized
        # in columns FIRST (ADVICE r8) — inlining plane_dots into
        # probe_buckets_from_dots would re-fold the whole dot product
        # per bucket bit and per flip-sort key.
        v = F.transform(F.col(self.vec_col),
                        lambda x: x.cast("double"))
        dotted = batch
        for t, s in enumerate(sets):
            dotted = dotted.withColumn(f"__dots{t}",
                                       plane_dots(v, s))
        probed = dotted.select(F.explode(F.flatten(F.array(*[
            probe_buckets_from_dots(F.col(f"__dots{t}"), len(s),
                                    self.n_probes)
            for t, s in enumerate(sets)]))).alias("__bucket"))
        # No pin on the queryable (r12): its ONLY consumer is the
        # matches write below, an action that completes BEFORE the
        # index overwrite mutates the ann/ store its lineage reads —
        # the eager pin this replaced materialized the ENTIRE pruned
        # index into executor block storage every batch, the
        # dominant share of the ≈2 s/batch stationary-soak slope
        # (BASELINE.md §r11/§r12). The batch itself stays pinned
        # (read by both writes, after the mutation starts).
        if self.cache_prepared_base:
            queryable = self._prepared_queryable(store, batch_id,
                                                 probed)
        else:
            queryable = store.probe(batch_id, probed,
                                    F.col("__bucket"))
        matches = query_ann_index(batch, queryable, self.id_col,
                                  self.vec_col, self.planes,
                                  k=self.k, rescore=self.rescore,
                                  n_probes=self.n_probes,
                                  tables=self.tables,
                                  prepared=self.cache_prepared_base)
        (matches.select(F.col("query_id").cast("long"),
                        F.col("neighbor_id").cast("long"),
                        "sim", F.col("rank").cast("int"))
         .write.mode("overwrite")
         .parquet(self._path(f"matches/batch_id={int(batch_id)}")))
        idx_cols = (["table"] if self.tables > 1 else []) + ["bucket"]
        store.write_batch(
            build_ann_index(batch, self.id_col, self.vec_col,
                            self.planes, tables=self.tables,
                            bits=self.bits)
            .select(F.col(self.id_col).cast("long"), *idx_cols,
                    F.col("qvec").cast("array<int>"), "scale"),
            batch_id)
        self._maybe_auto_compact(batch_id)
        if self.cache_prepared_base:
            self._prewarm_prepared_cache()

    def run_stream(self, stream: DataFrame,
                   checkpoint_dir: str | None = None,
                   available_now: bool = True):
        """Attach to a streaming frame via foreachBatch. Returns the
        started query (caller awaits/stops)."""
        writer = (stream.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation",
                          checkpoint_dir
                          or self._path("_checkpoint")))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
