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


def _stat_aggs(id_col: str, tokens_col: str | None) -> list:
    aggs = [F.count("*").alias("rows"),
            F.expr(f"bit_xor(xxhash64({id_col}))")
            .alias("membership_hash")]
    if tokens_col is not None:
        aggs.append(F.sum(tokens_col).cast("long").alias("tokens"))
    return aggs


def _recover_grouped_purge(spark, path: str) -> None:
    """Finish a grouped purge a crash interrupted: a leftover
    ``._staging_purge`` with Spark's ``_SUCCESS`` marker holds the
    complete survivor set for every shard dir still under it — swap
    those in (delete target, rename; both metadata ops, re-runnable),
    then drop staging. Without the marker the staging write never
    committed and the targets were never touched — drop the garbage.
    Either way the caller re-runs the normal purge flow afterwards
    (the anti-join is a no-op on already-purged shards), so the
    manifest refresh always completes."""
    jvm = spark.sparkContext._jvm
    staging = path.rstrip("/") + "/._staging_purge"
    jstaging = jvm.org.apache.hadoop.fs.Path(staging)
    fs = jstaging.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jstaging):
        return
    if fs.exists(jvm.org.apache.hadoop.fs.Path(staging + "/_SUCCESS")):
        for st in fs.listStatus(jstaging):
            name = st.getPath().getName()
            if not name.startswith("shard="):
                continue
            jtarget = jvm.org.apache.hadoop.fs.Path(
                path.rstrip("/") + "/" + name)
            if fs.exists(jtarget):
                fs.delete(jtarget, True)
            if not fs.rename(st.getPath(), jtarget):
                raise RuntimeError(
                    f"grouped-purge recovery rename of {name} failed; "
                    "staging kept")
    fs.delete(jstaging, True)


def purge_training_shards(spark, path: str, id_col: str, ids,
                          fmt: str = "parquet",
                          grouped_threshold: int = 16) -> dict:
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
    scan of the export. Below ``grouped_threshold`` affected shards
    (the takedown design point: tens of ids → few shards), each
    ``shard=N`` directory is rewritten through a staging swap
    (``janitor.rewrite_dataset``) with a broadcast anti-join on the
    ids. At or above it (mass takedowns — thousands of shards would
    otherwise serialize one Spark job each), ONE job reads every
    affected dir as a single frame (``basePath`` keeps the ``shard``
    column), anti-joins once, writes one ``partitionBy("shard")``
    staging export, and swaps each shard dir in with metadata renames.
    Untouched shards' bytes are never opened on either path. The
    manifest is recomputed for the rewritten shards (rows,
    membership_hash, tokens if present) and written LAST.

    Crash contract: every window converges on re-run. Both paths keep
    their staging until the swap completes, and BOTH recoveries run
    on entry — per-shard leftovers via ``janitor.recover_dataset``
    (before the shard is read, so a truncated target can never seed
    the next rewrite), grouped leftovers via the ``_SUCCESS``-marked
    ``._staging_purge`` protocol — after which the normal flow re-runs
    (no-op anti-join) and the manifest refresh completes. In-shard
    relative order is preserved and ``pos`` keeps its original values
    (gaps where rows were removed) — loaders keep a stable sort key,
    and a purged export never changes the order of surviving rows.

    Read-backs pin the pre-purge schema explicitly: inference would
    throw on a fully-emptied shard (JSON writes no schema-bearing
    files for 0 rows) and can drift column types for non-parquet
    formats against untouched sibling shards. A shard the manifest
    already records at 0 rows is skipped outright (nothing to remove;
    its data files may legitimately be gone).

    ``ids``: a DataFrame with ``id_col`` or an iterable of id values
    (materialized up front — a lazy iterator would otherwise be
    consumed piecemeal, and an empty generator is truthy).
    Returns ``{"affected_shards", "rows_removed", "manifest"}``.
    """
    from pyspark.sql import DataFrame as _DF

    from wp_etl_migration_spark.operators.sampling import hash_bucket
    from wp_etl_migration_spark.plans.janitor import (
        recover_dataset, rewrite_dataset)

    manifest = _read_manifest(spark, path)
    if manifest is None:
        raise ValueError(f"no _manifest.json under {path} — not a "
                         "write_training_shards export")
    n_shards, salt = int(manifest["n_shards"]), manifest["salt"]
    _recover_grouped_purge(spark, path)
    if not isinstance(ids, _DF):
        ids = list(ids)
        if not ids:
            return {"affected_shards": [], "rows_removed": 0,
                    "manifest": manifest}
        ids = spark.createDataFrame([(i,) for i in ids], [id_col])
    ids = ids.select(id_col).distinct()
    affected = sorted(
        r["shard"] for r in
        ids.select(F.pmod(hash_bucket(id_col, salt),
                          F.lit(n_shards)).cast("int").alias("shard"))
        .distinct().collect())

    def _entry(s):
        return manifest["shards"].get(str(s),
                                      manifest["shards"].get(s))

    # only shards the manifest knows hold rows; ids hashing into
    # never-written or already-emptied shards are absent by
    # construction (and an emptied JSON shard has no readable files)
    affected = [s for s in affected
                if _entry(s) is not None and int(_entry(s)["rows"])]
    # finish any per-shard swap a crash interrupted BEFORE looking at
    # (or reading) the targets — a committed staging is the one good
    # copy and must win over both a truncated and a missing dir
    for s in affected:
        recover_dataset(spark, path.rstrip("/") + f"/shard={s}")
    # a crash after a purge emptied a shard (dir removed) but before
    # the manifest refresh leaves a stale non-zero entry over a
    # missing dir — reconcile it to 0 here instead of throwing on read
    jvm = spark.sparkContext._jvm
    jbase = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    fs = jbase.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    present, vanished = [], []
    for s in affected:
        (present if fs.exists(jvm.org.apache.hadoop.fs.Path(
            f"{path.rstrip('/')}/shard={s}")) else vanished).append(s)
    removed = 0
    for s in vanished:
        entry = _entry(s)
        removed += int(entry["rows"])
        entry["rows"] = 0
        entry["membership_hash"] = 0
        if "tokens" in entry:
            entry["tokens"] = 0
    affected = present
    tokens_col = manifest.get("tokens_col")
    if tokens_col is None and any("tokens" in _entry(s)
                                  for s in affected):
        raise ValueError(
            "manifest has per-shard tokens but no tokens_col — "
            "export predates the purge surface; re-export")

    if affected and len(affected) >= grouped_threshold:
        removed += _grouped_purge(spark, path, id_col, ids, affected,
                                  manifest, fmt, tokens_col, _entry)
    else:
        for s in affected:
            shard_dir = path.rstrip("/") + f"/shard={s}"
            rows = spark.read.format(fmt).load(shard_dir)
            survivors = rows.join(F.broadcast(ids), on=id_col,
                                  how="left_anti")
            entry = _entry(s)
            aggs = _stat_aggs(id_col, tokens_col
                              if "tokens" in entry else None)
            rewrite_dataset(spark, shard_dir, survivors, fmt=fmt)
            back = spark.read.schema(rows.schema).format(fmt) \
                .load(shard_dir)
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


def _grouped_purge(spark, path: str, id_col: str, ids, affected,
                   manifest: dict, fmt: str, tokens_col, _entry) -> int:
    """Mass-takedown path: one anti-join job over every affected
    shard dir, one partitioned staging write, per-shard metadata
    swaps. O(affected bytes) I/O regardless of shard count."""
    jvm = spark.sparkContext._jvm
    base = path.rstrip("/")
    staging = base + "/._staging_purge"
    dirs = [f"{base}/shard={s}" for s in affected]
    rows = (spark.read.option("basePath", base).format(fmt)
            .load(dirs))
    survivors = rows.join(F.broadcast(ids), on=id_col, how="left_anti")
    (survivors.write.mode("overwrite").partitionBy("shard")
     .format(fmt).save(staging))
    # stats BEFORE the swap moves the files; explicit schema — an
    # all-shards-emptied staging has no data files to infer from
    with_tokens = any("tokens" in _entry(s) for s in affected)
    staged = (spark.read.option("basePath", staging)
              .schema(rows.schema).format(fmt).load(staging))
    stats = {int(r["shard"]): r for r in
             staged.groupBy("shard")
             .agg(*_stat_aggs(id_col,
                              tokens_col if with_tokens else None))
             .collect()}
    fs = jvm.org.apache.hadoop.fs.Path(staging).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    removed = 0
    for s in affected:
        jtarget = jvm.org.apache.hadoop.fs.Path(f"{base}/shard={s}")
        jstaged = jvm.org.apache.hadoop.fs.Path(
            f"{staging}/shard={s}")
        if fs.exists(jtarget):
            fs.delete(jtarget, True)
        if fs.exists(jstaged):
            if not fs.rename(jstaged, jtarget):
                raise RuntimeError(
                    f"grouped-purge rename of shard={s} failed; "
                    "staging kept — re-run to recover")
        # else: every row of the shard was purged — no dir remains,
        # exactly like a crashed-then-recovered empty swap
        entry = _entry(s)
        stat = stats.get(int(s))
        new_rows = int(stat["rows"]) if stat is not None else 0
        removed += int(entry["rows"]) - new_rows
        entry["rows"] = new_rows
        entry["membership_hash"] = (
            int(stat["membership_hash"])
            if stat is not None and stat["membership_hash"] is not None
            else 0)
        if "tokens" in entry:
            entry["tokens"] = (int(stat["tokens"] or 0)
                               if stat is not None else 0)
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
    return removed


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
