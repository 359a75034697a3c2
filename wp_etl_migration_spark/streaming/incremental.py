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
partition excluded (partition-pruned, and precise: an id anti-join
would also exclude an older batch's row sharing the id, breaking
dedup of re-delivered docs) — a retry therefore recomputes the exact
survivor set of the first attempt (the input batch is
offset-identical by the checkpoint contract) and replaces whatever
subset of the three partition writes landed, wherever the crash
fell. Plain parquet thus gets exactly-once STORE STATE; a
transactional table format (Delta/Iceberg via the same ``.write``
calls) remains the belt-and-braces choice when concurrent readers
must never glimpse a half-written partition.

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
  pointer file ``<root>_base/_CURRENT``
  (``{"folded_up_to": W, "runs": [{"gen": K, "num_subs": M}, …]}``).
  Each run's sub COUNT is adaptive: ``ceil(rows / rows_per_sub)``
  capped at ``num_subs``, recorded per run — a small run stays a
  handful of fat files (no small-file tax), a corpus-scale run fans
  out to the cap, and the probe always hashes with each RUN'S
  recorded modulus, so pruning stays exact across recompactions.

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

The probe then reads ``⋃ runs.filter(sub IN batch_subs) ∪ tail``:
the ``sub`` filter is a pure function of the join key, so pruned-away
run rows could never equi-join a batch key — Spark prunes them at the
partition LISTING (PartitionFilters, asserted in tests). The batch's
per-run sub sets are driver collects bounded by the CONSTANT
``num_subs`` (× at most ``max_runs`` runs), never by data size. Probe
cost is therefore ``|batch subs|/num_subs`` of each run plus the
(compaction-bounded) tail — sublinear in store size for trickle
batches, and never worse than the full scan for corpus-scale batches
that cover every sub. The same layout maps 1:1 onto Delta/Iceberg
(runs = data files, pointer = table log, merge = OPTIMIZE) when a
transactional format is preferred; the probe contract is unchanged.

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
    the stores — HDFS/S3/local). create(overwrite=True) of a one-block
    file is the manifest-grade atomicity the pointer needs: readers
    see the old or the new content, never a mix."""
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


def _delete(spark: SparkSession, uri: str) -> None:
    fs, jpath, _ = _hadoop_fs(spark, uri)
    if fs.exists(jpath):
        fs.delete(jpath, True)


class _IndexStore:
    """One probe-able incremental index: per-batch tail partitions
    plus a LEVELED list of compacted sub-bucketed runs (module
    docstring).

    ``columns`` is the stored schema WITHOUT batch_id/sub (e.g.
    ``"doc_id long, digest string"``); ``key_col`` names the join-key
    column whose hash defines each run's ``sub`` partition;
    ``max_runs`` bounds how many compacted runs may accumulate before
    they merge into one."""

    def __init__(self, spark: SparkSession, root: str, columns: str,
                 key_col: str, num_subs: int,
                 rows_per_sub: int = 1_000_000, max_runs: int = 4):
        self.spark = spark
        self.root = root
        self.columns = columns
        self.key_col = key_col
        self.num_subs = int(num_subs)          # per-run sub cap
        self.rows_per_sub = int(rows_per_sub)  # adaptive target
        self.max_runs = int(max_runs)

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

    def pointer(self) -> dict | None:
        """``{"folded_up_to": W, "runs": [{"gen": K, "num_subs": M},
        ...]}`` — the committed base state, or None before the first
        compaction."""
        text = _read_text(self.spark,
                          os.path.join(self._base_root, "_CURRENT"))
        return None if text is None else json.loads(text)

    def runs(self) -> list[dict]:
        ptr = self.pointer()
        return list(ptr["runs"]) if ptr else []

    # -- read paths --------------------------------------------------------
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
        return self.spark.read.schema(self.columns + ", sub int") \
            .parquet(os.path.join(self._base_root,
                                  f"gen-{int(run['gen'])}"))

    def probe(self, own_batch_id: int, key_df: DataFrame | None = None,
              key_col=None) -> DataFrame:
        """The queryable index for a batch: every compacted run ∪ the
        tail, with the batch's OWN partition and all folded-into-base
        partitions excluded from the tail. With ``(key_df, key_col)``
        given, each run is pruned to the batch keys' sub-buckets under
        THAT RUN'S recorded modulus (one bounded driver collect per
        run; runs ≤ max_runs) — exact, since ``sub`` is a pure
        function of the join key. Returns ``columns`` only."""
        cols = [c.split()[0] for c in self.columns.split(",")]
        ptr = self.pointer()
        tail = self._read_tail() \
            .filter(F.col("batch_id") != int(own_batch_id))
        if ptr is None:
            return tail.select(*cols)
        out = tail.filter(F.col("batch_id") > int(ptr["folded_up_to"])) \
            .select(*cols)
        for run in ptr["runs"]:
            base = self._read_run(run)
            if key_df is not None and int(run["num_subs"]) > 1:
                subs = self._subs_of(key_df, key_col,
                                     int(run["num_subs"]))
                base = base.filter(F.col("sub").isin(subs))
            out = out.unionByName(base.select(*cols))
        return out

    # -- write paths ---------------------------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """Overwrite this batch's tail partition (the replay unit)."""
        df.write.mode("overwrite").parquet(
            os.path.join(self.root, f"batch_id={int(batch_id)}"))

    def compact(self, up_to: int) -> None:
        """Fold tail partitions with ``batch_id <= up_to`` into a NEW
        compacted run — O(folded tail), not O(store) — and, when that
        would leave more than ``max_runs`` runs, merge everything into
        one (the amortized leveling trade: frequent cheap folds, rare
        full rewrites). Pointer flip = commit point; idempotent at any
        crash position (module docstring). No future batch may use an
        id <= ``up_to``."""
        from wp_etl_migration_spark.operators.checkpoint import pin
        ptr = self.pointer()
        runs_old = list(ptr["runs"]) if ptr else []
        folded_old = int(ptr["folded_up_to"]) if ptr else -1
        if up_to <= folded_old:
            return
        # Garbage from a crashed prior run (pointer flipped, deletes
        # not finished): folded tail dirs and unlisted gen dirs are
        # already invisible to probes — remove them first so the fold
        # below cannot double-read them.
        self._sweep(folded_old, {int(r["gen"]) for r in runs_old})
        cols = [c.split()[0] for c in self.columns.split(",")]
        new = self._read_tail() \
            .filter((F.col("batch_id") > folded_old)
                    & (F.col("batch_id") <= int(up_to))) \
            .select(*cols)
        merge = len(runs_old) + 1 > self.max_runs
        if merge:
            for run in runs_old:
                new = new.unionByName(self._read_run(run).select(*cols))
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
            added = {"gen": gen_new, "num_subs": int(subs_new)}
            runs_new = [added] if merge else runs_old + [added]
        _write_text(self.spark,
                    os.path.join(self._base_root, "_CURRENT"),
                    json.dumps({"folded_up_to": int(up_to),
                                "runs": runs_new}))
        # Post-commit cleanup; a crash here leaves garbage the next
        # compact (or this sweep on rerun) removes.
        self._sweep(int(up_to), {int(r["gen"]) for r in runs_new})

    def _sweep(self, up_to: int, keep_gens: set[int]) -> None:
        """Delete folded tail partitions (batch_id <= up_to) and base
        generation dirs the pointer no longer lists."""
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
        fs, jbase, _ = _hadoop_fs(self.spark, self._base_root)
        if fs.exists(jbase):
            for status in fs.listStatus(jbase):
                name = status.getPath().getName()
                if not name.startswith("gen-"):
                    continue
                try:
                    gen = int(name[len("gen-"):])
                except ValueError:
                    continue
                if gen not in keep_gens:
                    fs.delete(status.getPath(), True)


class IncrementalDedup:
    """Stateful wrapper owning the three stores under ``store_dir``:
    ``corpus/`` (surviving docs, hive-partitioned by ``batch_id``)
    and the two probe-able indexes ``digests/`` (id, md5) and
    ``bands/`` (id, band, band_hash), each a tail of per-batch
    partitions plus an optional compacted sub-bucketed base — see the
    module docstring for the layout, probe-pruning, and compaction
    contract. ``compact(up_to)`` folds both indexes (call it
    periodically from a maintenance hook with the last
    checkpoint-committed batch id).

    Store format note: tail partitions are v2-compatible; the base is
    new in r8. Not mixable with the older flat append layout — use a
    fresh ``store_dir``."""

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str, text_col: str,
                 n: int = 3, num_hashes: int = 16,
                 rows_per_band: int = 2,
                 max_bucket: int | None = None,
                 num_subs: int = 256,
                 rows_per_sub: int = 1_000_000, max_runs: int = 4):
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_hashes = n, num_hashes
        self.rows_per_band = rows_per_band
        self.max_bucket = max_bucket
        self.num_subs = int(num_subs)
        self.rows_per_sub = int(rows_per_sub)
        self.max_runs = int(max_runs)

    def _path(self, name: str) -> str:
        return os.path.join(self.store_dir, name)

    @property
    def _digest_store(self) -> _IndexStore:
        return _IndexStore(self.spark, self._path("digests"),
                           f"{self.id_col} long, digest string",
                           "digest", self.num_subs,
                           self.rows_per_sub, self.max_runs)

    @property
    def _band_store(self) -> _IndexStore:
        return _IndexStore(
            self.spark, self._path("bands"),
            f"{self.id_col} long, band int, band_hash string",
            "band_hash", self.num_subs, self.rows_per_sub,
            self.max_runs)

    def compact(self, up_to: int) -> None:
        """Fold both index tails through ``up_to`` into their bases.
        Only pass batch ids the checkpoint has committed; no future
        batch may reuse an id <= ``up_to``."""
        self._digest_store.compact(up_to)
        self._band_store.compact(up_to)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """The foreachBatch body: dedup ``batch`` against the stores,
        write the survivors' three partitions. Safe to call directly
        for batch backfills — give each backfill batch a DISTINCT,
        monotone ``batch_id`` (it keys the per-store ``batch_id=N``
        partition).

        Replay-safe at any crash position: both stored indexes are
        queried with the batch's OWN ``batch_id=N`` partition excluded
        (a partition-pruned filter — precise, unlike an id anti-join,
        which would also exclude an OLDER batch's row that happens to
        share an id), so a retry after a partial write recomputes
        exactly the first attempt's survivor set (the batch content is
        offset-identical under the foreachBatch checkpoint contract)
        and the per-partition overwrites replace whichever of the
        three writes landed — store rows can neither duplicate nor be
        lost. Because only the batch's own partition is excluded, a
        doc RE-DELIVERED under the same id in a later batch (new
        ``batch_id``, not a checkpoint replay) dedups normally against
        its stored older copy: identical content drops in the exact
        pass, near-identical content drops in the LSH pass — the
        corpus cannot accumulate one id per delivery. Only a same-id
        re-delivery whose content is genuinely DIFFERENT (no exact or
        near match) lands twice, under two batch_id partitions — an
        upstream id-assignment bug this layer preserves rather than
        silently merges."""
        from wp_etl_migration_spark.operators.checkpoint import pin
        from wp_etl_migration_spark.operators.dedup import (
            content_digest, cross_corpus_exact_dedup,
            incremental_lsh_pairs, lsh_bands)
        id_c, text_c = self.id_col, self.text_col

        batch = pin(batch)
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
    the batch's own partition — a foreachBatch retry (at-least-once)
    recomputes identical frames and replaces whichever partition
    writes landed, so match and index rows can neither duplicate nor
    be lost whatever the crash position (see :meth:`process_batch`).
    Partition exclusion (not an id anti-join) also means a vector
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
    stays ``batch_id``-only (it is a feed, never probed by key). Not
    mixable with the older flat ``ann/`` append layout — use a fresh
    ``store_dir`` per format.
    """

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str, vec_col: str,
                 planes: list[list[float]], k: int = 5,
                 rescore: str = "arrow", num_subs: int = 256,
                 rows_per_sub: int = 1_000_000, n_probes: int = 1,
                 max_runs: int = 4):
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.vec_col = id_col, vec_col
        self.planes, self.k, self.rescore = planes, k, rescore
        self.num_subs = int(num_subs)
        self.rows_per_sub = int(rows_per_sub)
        self.n_probes = int(n_probes)
        self.max_runs = int(max_runs)

    def _path(self, name: str) -> str:
        return os.path.join(self.store_dir, name)

    @property
    def _ann_store(self) -> _IndexStore:
        return _IndexStore(
            self.spark, self._path("ann"),
            f"{self.id_col} long, bucket string, qvec array<int>, "
            "scale double",
            "bucket", self.num_subs, self.rows_per_sub,
            self.max_runs)

    def compact(self, up_to: int) -> None:
        """Fold the ann tail through ``up_to`` into its base. Only
        pass checkpoint-committed batch ids; no future batch may
        reuse an id <= ``up_to``."""
        self._ann_store.compact(up_to)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """The foreachBatch body: query the stored index minus the
        batch's own ``ann/batch_id=N`` partition, overwrite the
        batch's match partition, then overwrite its index partition.
        Safe to call directly for batch backfills — pass each backfill
        batch a DISTINCT, monotone ``batch_id`` (it keys both
        per-batch partitions; reusing an id overwrites that batch's
        rows, which is exactly the replay semantics).

        Replay-safe at any crash position (foreachBatch is
        at-least-once): the querying index excludes the batch's own
        partition — precise even when a LATER batch re-delivers an
        already-indexed id, where the old id anti-join both shrank the
        queryable index and (when every id was already indexed)
        short-circuited without writing the match partition at all —
        so a retry after a partial ``ann/batch_id=N`` write still
        scores the full batch strictly backward, and both
        per-partition overwrites replace whatever the crashed attempt
        left behind. No short-circuit is needed: a fully-committed
        replay recomputes and overwrites byte-identical partitions."""
        from wp_etl_migration_spark.operators.checkpoint import pin
        from wp_etl_migration_spark.operators.similarity import (
            build_ann_index, plane_dots, probe_buckets_from_dots,
            query_ann_index)
        store = self._ann_store
        batch = pin(batch)
        # Probe pruning: a query joins only stored rows sharing one of
        # its PROBED buckets (own bucket + n_probes−1 flipped-bit
        # buckets — the same expansion query_ann_index applies), so
        # compacted-base subs outside that set can never match. The
        # probed buckets are exploded batch-side before hashing; the
        # collect stays bounded by the base's sub modulus. Skipped in
        # the tail-only regime (nothing to prune).
        v = F.transform(F.col(self.vec_col),
                        lambda x: x.cast("double"))
        probed = batch.select(F.explode(probe_buckets_from_dots(
            plane_dots(v, self.planes), len(self.planes),
            self.n_probes)).alias("__bucket"))
        # Pin before the two writes: the queryable frame reads the
        # ann/ store being written — without the pin the index
        # overwrite could re-list the files of the store it is
        # mutating.
        queryable = pin(store.probe(batch_id, probed,
                                    F.col("__bucket")))
        matches = query_ann_index(batch, queryable, self.id_col,
                                  self.vec_col, self.planes,
                                  k=self.k, rescore=self.rescore,
                                  n_probes=self.n_probes)
        (matches.select(F.col("query_id").cast("long"),
                        F.col("neighbor_id").cast("long"),
                        "sim", F.col("rank").cast("int"))
         .write.mode("overwrite")
         .parquet(self._path(f"matches/batch_id={int(batch_id)}")))
        store.write_batch(
            build_ann_index(batch, self.id_col, self.vec_col,
                            self.planes)
            .select(F.col(self.id_col).cast("long"), "bucket",
                    F.col("qvec").cast("array<int>"), "scale"),
            batch_id)

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
