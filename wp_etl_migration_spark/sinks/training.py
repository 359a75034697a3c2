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
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/_manifest.json")
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return {"ok": False, "mismatches": {},
                "missing_shards": [], "unexpected_shards": [],
                "error": "no _manifest.json"}
    stream = fs.open(jpath)
    try:
        manifest = json.loads(
            jvm.org.apache.commons.io.IOUtils.toString(stream,
                                                       "UTF-8"))
    finally:
        stream.close()
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
    missing = sorted(set(want) - set(actual))
    unexpected = sorted(set(actual) - set(want))
    return {"ok": not mismatches and not missing and not unexpected,
            "mismatches": mismatches,
            "missing_shards": missing,
            "unexpected_shards": unexpected}
