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
fell. Plain parquet thus gets
exactly-once STORE STATE; a transactional table format (Delta/
Iceberg via the same ``.write`` calls) remains the belt-and-braces
choice when concurrent readers must never glimpse a half-written
partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalDedup:
    """Stateful wrapper owning the three stores under ``store_dir``:
    ``corpus/`` (surviving docs, hive-partitioned by ``batch_id``),
    ``digests/`` (id, md5) and ``bands/`` (id, band, band_hash), both
    hive-partitioned by ``(batch_id, sub)`` where ``sub =
    pmod(xxhash64(join key), num_subs)`` — the probe-prune sub-bucket.

    Why ``sub`` exists: the per-batch probe is an equi-join against a
    stored index that grows with the corpus; after 10⁵ batches a full
    index scan per batch is the bottleneck. ``sub`` is a pure function
    of the join key, so stored rows outside the batch's own sub set
    can never match — the probe filters to ``sub IN (batch subs)``,
    which Spark prunes at the partition listing (PartitionFilters;
    asserted in tests). The batch's sub set is collected driver-side,
    bounded by the CONSTANT ``num_subs``, never by data size. The
    pruning bites when the batch's distinct-key count is small
    relative to ``num_subs`` (trickle batches — the steady state a
    continuous loop converges to); a corpus-scale batch covers every
    sub and degrades gracefully to exactly today's full-index
    equi-join, never worse. The sub layout is also the unit a
    compactor would merge (all ``batch_id`` partitions of one ``sub``
    → one sorted file) to bound file counts at 10⁵ batches; per-batch
    partitions stay authoritative for replay.

    Store format note (v3): not mixable with the v2 ``batch_id``-only
    layout or the older flat layout — use a fresh ``store_dir``."""

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str, text_col: str,
                 n: int = 3, num_hashes: int = 16,
                 rows_per_band: int = 2,
                 max_bucket: int | None = None,
                 num_subs: int = 64):
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_hashes = n, num_hashes
        self.rows_per_band = rows_per_band
        self.max_bucket = max_bucket
        self.num_subs = int(num_subs)

    def _path(self, name: str) -> str:
        return os.path.join(self.store_dir, name)

    def _sub(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.num_subs)).cast("int")

    def _subs_of(self, df: DataFrame, col) -> list[int]:
        """Distinct sub-buckets of a batch-side key column — a
        driver collect bounded by the constant ``num_subs``."""
        return [r[0] for r in df.select(self._sub(col).alias("__s"))
                .distinct().collect()]

    def _load(self, name: str, schema: str) -> DataFrame:
        """Read a store, or an empty frame before its first append.
        Probed by attempting the read (not os.path) so the stores can
        live on any Hadoop filesystem (HDFS/S3), not just local disk."""
        from pyspark.errors import AnalysisException
        path = self._path(name)
        try:
            df = self.spark.read.schema(schema).parquet(path)
            df.schema  # force path resolution now, inside the try
            return df
        except AnalysisException:
            return self.spark.createDataFrame([], schema)

    def process_batch(self, batch: DataFrame, batch_id: int = 0) -> None:
        """The foreachBatch body: dedup ``batch`` against the stores,
        write the survivors' three partitions. Safe to call directly
        for batch backfills — give each backfill batch a DISTINCT
        ``batch_id`` (it keys the per-store ``batch_id=N`` partition).

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
        not_own = F.col("batch_id") != int(batch_id)
        # Exact pass against the stored digest index minus this
        # batch's own (possibly partially-written) partition (empty
        # store ⇒ pure in-batch dedup); historical corpus text is
        # never re-read, and the probe prunes to the batch's own
        # digest sub-buckets — rows elsewhere cannot equi-join.
        digest_subs = self._subs_of(batch, content_digest([text_c]))
        digests = self._load(
            "digests",
            f"{id_c} long, digest string, batch_id int, sub int") \
            .filter(not_own & F.col("sub").isin(digest_subs)) \
            .select(id_c, "digest")
        exact = cross_corpus_exact_dedup(batch, digests, id_c,
                                         [text_c],
                                         corpus_digest_col="digest")

        # Near-dup pass against the band index, own partition excluded
        # for the same replay reason and sub-pruned the same way;
        # colliding batch docs (vs corpus, or vs a smaller-id batch
        # doc) drop. The batch's bands are materialized ONCE here —
        # the sub collect, the candidate join, and the survivors'
        # band write below all reuse the pinned frame instead of
        # re-running the shingle+signature pass.
        new_bands = pin(lsh_bands(exact, id_c, text_c, self.n,
                                  self.num_hashes, self.rows_per_band))
        band_subs = self._subs_of(new_bands, F.col("band_hash"))
        band_index = self._load(
            "bands",
            f"{id_c} long, band int, band_hash string, "
            "batch_id int, sub int") \
            .filter(not_own & F.col("sub").isin(band_subs)) \
            .select(id_c, "band", "band_hash")
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

        part = f"batch_id={int(batch_id)}"
        survivors.drop("__digest").write.mode("overwrite") \
            .parquet(self._path(f"corpus/{part}"))
        # Index writes carry the sub-bucket as a hive partition under
        # the batch partition; repartition("sub") keeps the file count
        # at ≤ num_subs per store per batch (without it every task
        # writes every sub it holds). Static overwrite of the
        # batch_id=N dir preserves the replay contract: a retry
        # replaces the WHOLE batch partition, sub dirs included.
        (survivors.select(F.col(id_c).cast("long"),
                          F.col("__digest").alias("digest"))
         .withColumn("sub", self._sub(F.col("digest")))
         .repartition("sub")
         .write.partitionBy("sub").mode("overwrite")
         .parquet(self._path(f"digests/{part}")))
        # Survivor bands are a subset of the pinned batch bands — a
        # semi-join, not a second signature pass.
        (new_bands.join(survivors.select(id_c), id_c, "left_semi")
         .select(F.col(id_c).cast("long"), F.col("band").cast("int"),
                 "band_hash")
         .withColumn("sub", self._sub(F.col("band_hash")))
         .repartition("sub")
         .write.partitionBy("sub").mode("overwrite")
         .parquet(self._path(f"bands/{part}")))

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
    ids must dedupe upstream. Store format note (v3): ``ann/`` is
    hive-partitioned by ``(batch_id, sub)`` where ``sub =
    pmod(xxhash64(bucket), num_subs)`` — the probe-prune sub-bucket
    (see :class:`IncrementalDedup`: a batch's query only joins stored
    rows sharing its hyperplane buckets, so the probe filters to the
    batch's own sub set, pruned at the partition listing; exact
    because the class queries with ``n_probes=1``, each query touching
    only its own bucket). ``matches/`` stays ``batch_id``-only (it is
    a feed, never probed by key). Not mixable with the v2
    ``batch_id``-only or older flat ``ann/`` layouts — use a fresh
    ``store_dir`` per format.
    """

    def __init__(self, spark: SparkSession, store_dir: str,
                 id_col: str, vec_col: str,
                 planes: list[list[float]], k: int = 5,
                 rescore: str = "arrow", num_subs: int = 64):
        self.spark = spark
        self.store_dir = store_dir
        self.id_col, self.vec_col = id_col, vec_col
        self.planes, self.k, self.rescore = planes, k, rescore
        self.num_subs = int(num_subs)

    def _path(self, name: str) -> str:
        return os.path.join(self.store_dir, name)

    def _sub(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.num_subs)).cast("int")

    def _load_index(self) -> DataFrame:
        from pyspark.errors import AnalysisException
        schema = (f"{self.id_col} long, bucket string, "
                  "qvec array<int>, scale double, batch_id int, "
                  "sub int")
        try:
            df = self.spark.read.schema(schema).parquet(
                self._path("ann"))
            df.schema
            return df
        except AnalysisException:
            return self.spark.createDataFrame([], schema)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """The foreachBatch body: query the stored index minus the
        batch's own ``ann/batch_id=N`` partition, overwrite the
        batch's match partition, then overwrite its index partition.
        Safe to call directly for batch backfills — pass each backfill
        batch a DISTINCT ``batch_id`` (it keys both per-batch
        partitions; reusing an id overwrites that batch's rows, which
        is exactly the replay semantics).

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
            build_ann_index, hyperplane_bucket, query_ann_index)
        # Pin before the two writes: the queryable frame reads the
        # ann/ store being written — without the pin the index
        # overwrite could re-list the files of the store it is
        # mutating.
        index = self._load_index()
        batch = pin(batch)
        # Probe pruning: a query (n_probes=1) joins only stored rows
        # sharing its hyperplane bucket, so stored subs outside the
        # batch's own bucket-sub set can never match. The collect is
        # bounded by the constant num_subs.
        dims = len(self.planes[0])
        v = F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
        batch_subs = [r[0] for r in batch.select(
            self._sub(hyperplane_bucket(v, self.planes, dims))
            .alias("__s")).distinct().collect()]
        queryable = pin(
            index.filter((F.col("batch_id") != int(batch_id))
                         & F.col("sub").isin(batch_subs))
            .drop("batch_id", "sub"))
        matches = query_ann_index(batch, queryable, self.id_col,
                                  self.vec_col, self.planes,
                                  k=self.k, rescore=self.rescore)
        (matches.select(F.col("query_id").cast("long"),
                        F.col("neighbor_id").cast("long"),
                        "sim", F.col("rank").cast("int"))
         .write.mode("overwrite")
         .parquet(self._path(f"matches/batch_id={int(batch_id)}")))
        (build_ann_index(batch, self.id_col, self.vec_col,
                         self.planes)
         .select(F.col(self.id_col).cast("long"), "bucket",
                 F.col("qvec").cast("array<int>"), "scale")
         .withColumn("sub", self._sub(F.col("bucket")))
         .repartition("sub")
         .write.partitionBy("sub").mode("overwrite")
         .parquet(self._path(f"ann/batch_id={int(batch_id)}")))

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
