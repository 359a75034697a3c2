"""Training-data shard writer (LLM-pipeline extension; no counterpart
in the reference, whose sinks target WordPress/files).

``write_training_shards`` packages a curated corpus for a data loader:
deterministic global shuffle (``operators.sampling.global_shuffle``) →
one parquet directory per shard, each shard's rows sorted by shuffle
position → a JSON manifest with per-shard row/token counts. Loaders
stream shards independently; the content-addressed shuffle means a
re-run over the same corpus produces byte-identical shard membership
and order, so resumed/backfilled exports agree forever.

Scale: one uniform-keyed shuffle (the shard hash) and a per-shard
sort; ``partitionBy("shard")`` writes each shard's files under its own
directory with no extra exchange (the frame is already partitioned by
shard). The manifest aggregation is shard-count-sized.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.sampling import global_shuffle


def write_training_shards(df: DataFrame, path: str, id_col: str,
                          n_shards: int, salt: str = "",
                          tokens_col: str | None = None,
                          fmt: str = "parquet",
                          compression: str | None = None) -> dict:
    """Write ``df`` as ``path/shard=N/*.<fmt>`` in deterministic
    shuffled order plus a ``path/_manifest.json`` (underscore-prefixed
    so dataset readers skip it, like ``_SUCCESS``); returns the
    manifest dict: {n_shards, n_rows, shards: {N: {rows, tokens?}}}.

    ``tokens_col`` (e.g. the corpus pipeline's ``n_tokens``) adds
    per-shard token totals to the manifest — what a sampler needs to
    weight shards.

    ``fmt`` is any Spark batch sink format: ``parquet`` (default) for
    columnar loaders, ``json`` for the JSONL(.gz) layout most
    tokenizer/dataloader stacks stream (pass
    ``compression='gzip'``/'zstd'); same layout, ordering and manifest
    either way.

    Each shard's manifest entry carries a ``membership_hash``
    (``bit_xor(xxhash64(id))`` — order-insensitive, computed in the
    same aggregation pass), making the determinism claim above
    AUDITABLE: two exports of the same corpus agree shard-by-shard
    iff their manifests match, no re-read of either export needed.
    """
    shuffled = global_shuffle(df, id_col, n_shards, salt=salt)
    writer = (shuffled
              .repartition(n_shards, "shard")
              .sortWithinPartitions("shard", "pos")
              .write.mode("overwrite").partitionBy("shard")
              .format(fmt))
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.save(path)

    aggs = [F.count("*").alias("rows"),
            F.expr(f"bit_xor(xxhash64({id_col}))")
            .alias("membership_hash")]
    if tokens_col is not None:
        aggs.append(F.sum(tokens_col).cast("long").alias("tokens"))
    per_shard = (shuffled.groupBy("shard").agg(*aggs)
                 .orderBy("shard").collect())
    manifest = {
        "n_shards": n_shards,
        "salt": salt,
        # recorded so in-place maintenance (purge_training_shards)
        # can recompute per-shard token totals without being told
        "tokens_col": tokens_col,
        "n_rows": sum(r["rows"] for r in per_shard),
        "shards": {int(r["shard"]): {k: r[k] for k in r.asDict()
                                     if k != "shard"}
                   for r in per_shard},
    }
    _write_text(df.sparkSession, path.rstrip("/") + "/_manifest.json",
                json.dumps(manifest, indent=1, sort_keys=True))
    return manifest


def _write_text(spark, uri: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so the
    manifest lands on the SAME filesystem as the shards (HDFS/S3/
    local) — a local ``open()`` would succeed for local paths but
    throw after the shard write on any remote URI, leaving shards
    without a manifest."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jpath.getFileSystem(conf)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_manifest(spark, path: str) -> dict | None:
    """``_manifest.json`` through the Hadoop FileSystem API (same
    filesystem as the shards — see :func:`_write_text`); None when
    absent."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/_manifest.json")
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        return json.loads(
            jvm.org.apache.commons.io.IOUtils.toString(stream,
                                                       "UTF-8"))
    finally:
        stream.close()


def purge_training_shards(spark, path: str, id_col: str, ids,
                          fmt: str = "parquet") -> dict:
    """Right-to-be-forgotten purge of a WRITTEN shard export — the
    training-sink twin of the takedown surfaces the index stores
    already have (``operators.dedup.tombstone_index``/``purge_index``,
    ``IncrementalDedup.purge_corpus``): physically remove a set of
    document ids from an export in place, touching ONLY the shards
    that can contain them.

    Shard membership is content-addressed (``global_shuffle``:
    shard = pmod(md5-bucket(salt ∥ id), n_shards), with both salt and
    n_shards recorded in the manifest), so the affected shard set is
    COMPUTED from the ids alone — one tiny job over the id set, no
    scan of the export. Each affected ``shard=N`` directory is
    rewritten through a staging swap (``janitor.rewrite_dataset``)
    with a broadcast anti-join on the ids; untouched shards' bytes
    are never opened. The manifest is recomputed for the rewritten
    shards (rows, membership_hash, tokens if present) and written
    LAST.

    Crash contract: a crash mid-purge leaves some shards rewritten
    with a stale manifest — ``verify_training_shards`` reports the
    mismatch, and re-running the purge converges (the anti-join
    removes nothing further; the manifest refresh completes), so the
    recovery action is simply "run it again". In-shard relative order
    is preserved and ``pos`` keeps its original values (gaps where
    rows were removed) — loaders keep a stable sort key, and a purged
    export never changes the order of surviving rows.

    ``ids``: a DataFrame with ``id_col`` or an iterable of id values.
    Returns ``{"affected_shards", "rows_removed", "manifest"}``.
    """
    from pyspark.sql import DataFrame as _DF

    from wp_etl_migration_spark.operators.sampling import hash_bucket
    from wp_etl_migration_spark.plans.janitor import rewrite_dataset

    manifest = _read_manifest(spark, path)
    if manifest is None:
        raise ValueError(f"no _manifest.json under {path} — not a "
                         "write_training_shards export")
    n_shards, salt = int(manifest["n_shards"]), manifest["salt"]
    if not isinstance(ids, _DF):
        ids = spark.createDataFrame([(i,) for i in ids],
                                    [id_col]) if ids else None
        if ids is None:
            return {"affected_shards": [], "rows_removed": 0,
                    "manifest": manifest}
    ids = ids.select(id_col).distinct()
    affected = sorted(
        r["shard"] for r in
        ids.select(F.pmod(hash_bucket(id_col, salt),
                          F.lit(n_shards)).cast("int").alias("shard"))
        .distinct().collect())
    # only shards the manifest knows can hold rows; ids hashing into
    # never-written shards are absent by construction
    affected = [s for s in affected if str(s) in manifest["shards"]
                or s in manifest["shards"]]

    removed = 0
    for s in affected:
        shard_dir = path.rstrip("/") + f"/shard={s}"
        rows = spark.read.format(fmt).load(shard_dir)
        survivors = rows.join(F.broadcast(ids), on=id_col,
                              how="left_anti")
        aggs = [F.count("*").alias("rows"),
                F.expr(f"bit_xor(xxhash64({id_col}))")
                .alias("membership_hash")]
        entry = manifest["shards"].get(str(s),
                                       manifest["shards"].get(s))
        tokens_col = manifest.get("tokens_col")
        if "tokens" in entry:
            if tokens_col is None:
                raise ValueError(
                    "manifest has per-shard tokens but no tokens_col "
                    "— export predates the purge surface; re-export")
            aggs.append(F.sum(tokens_col).cast("long").alias("tokens"))
        rewrite_dataset(spark, shard_dir, survivors, fmt=fmt)
        back = spark.read.format(fmt).load(shard_dir)
        stat = back.agg(*aggs).first()
        removed += int(entry["rows"]) - int(stat["rows"])
        entry["rows"] = int(stat["rows"])
        entry["membership_hash"] = (int(stat["membership_hash"])
                                    if stat["membership_hash"]
                                    is not None else 0)
        if "tokens" in entry:
            entry["tokens"] = int(stat["tokens"] or 0)
    manifest["n_rows"] = sum(int(v["rows"])
                             for v in manifest["shards"].values())
    _write_text(spark, path.rstrip("/") + "/_manifest.json",
                json.dumps(manifest, indent=1, sort_keys=True))
    return {"affected_shards": affected, "rows_removed": removed,
            "manifest": manifest}


def verify_training_shards(spark, path: str, id_col: str,
                           fmt: str = "parquet") -> dict:
    """Reader-side integrity check of a shard export against its
    ``_manifest.json`` (r10): recompute per-shard row counts and
    membership hashes from the written files and diff them against
    the manifest. Returns ``{"ok": bool, "mismatches": {shard:
    {field: (manifest, actual)}}, "missing_shards": [...],
    "unexpected_shards": [...]}`` — the check a loader runs before
    trusting a resumed or remotely-copied export.

    One scan of the export (count + bit_xor per shard, map-side
    combined); no ordering check — in-shard order is enforced by the
    writer's sort and is irrelevant to membership integrity."""
    from pyspark.errors import AnalysisException
    manifest = _read_manifest(spark, path)
    if manifest is None:
        return {"ok": False, "mismatches": {},
                "missing_shards": [], "unexpected_shards": [],
                "error": "no _manifest.json"}
    try:
        actual = {int(r["shard"]): r for r in
                  (spark.read.format(fmt).load(path)
                   .groupBy("shard")
                   .agg(F.count("*").alias("rows"),
                        F.expr(f"bit_xor(xxhash64({id_col}))")
                        .alias("membership_hash"))
                   .collect())}
    except AnalysisException:
        return {"ok": False, "mismatches": {},
                "missing_shards": sorted(int(s)
                                         for s in manifest["shards"]),
                "unexpected_shards": [], "error": "unreadable export"}
    want = {int(s): v for s, v in manifest["shards"].items()}
    mismatches: dict = {}
    for s in sorted(set(want) & set(actual)):
        diff = {}
        for field in ("rows", "membership_hash"):
            if field in want[s] and \
                    int(want[s][field]) != int(actual[s][field]):
                diff[field] = (int(want[s][field]),
                               int(actual[s][field]))
        if diff:
            mismatches[s] = diff
    # a shard purge_training_shards emptied (rows 0) legitimately has
    # no group in the read-back — absent ≠ missing for such entries
    missing = sorted(s for s in set(want) - set(actual)
                     if int(want[s].get("rows", 0)) != 0)
    unexpected = sorted(set(actual) - set(want))
    return {"ok": not mismatches and not missing and not unexpected,
            "mismatches": mismatches,
            "missing_shards": missing,
            "unexpected_shards": unexpected}
