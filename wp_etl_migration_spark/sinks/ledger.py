"""Ledger lineage sink + registry (SURVEY §2.2 L12, §2.1 S10, §2.4 J9).

≙ LedgerLoader.php:47-60 (per-row ledger entries: ``etl.uid`` +
prefix-reduced ``ledger.*`` fields), WithLedger.php:81-104 (written as
``<name>-ledger-<uid>.json``), LedgerRegistry.php:93-129 (dependent jobs
glob the dir, load the latest ledger as a DataFrame).

Spark-first: the ledger is an append-only JSON (or parquet) dataset per
job run, written distributed; the registry picks the latest run directory
by its sortable timestamp suffix and reads it back lazily. Dependent jobs
get a broadcast-eligible DataFrame (J9: ledger ⋈ stream lookups).
"""

from __future__ import annotations

import glob
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UID_COL = "etl.uid"


def with_uid(df: DataFrame, uid_col: str = UID_COL) -> DataFrame:
    """Attach the engine-owned per-row uuid (≙ Load Orchestrator.php:100)."""
    return df.withColumn(uid_col, F.expr("uuid()"))


def ledger_entries(df: DataFrame, uid_col: str = UID_COL,
                   prefix: str = "ledger.") -> DataFrame:
    """Project the ledger view of a stream: uid + ``ledger.*`` (stripped).

    ≙ LedgerLoader.php:47-60's reduce_row_on_prefix projection.
    """
    ledger_cols = [c for c in df.columns if c.startswith(prefix)]
    out = df.select(F.col("`" + uid_col + "`").alias("uid"),
                    *[F.col("`" + c + "`") for c in ledger_cols])
    return out.toDF("uid", *[c[len(prefix):] for c in ledger_cols])


def write_ledger(df: DataFrame, ledger_dir: str, name: str,
                 uid_col: str = UID_COL, prefix: str = "ledger.",
                 fmt: str = "json") -> str:
    """Write the ledger dataset for one job run; returns its path.

    Run directories are ``<name>-ledger-<millis>-<uid8>`` — sortable by
    timestamp so the registry's "latest" pick is a name sort, no mtimes.
    """
    run_id = f"{int(time.time() * 1000):015d}-{uuid.uuid4().hex[:8]}"
    path = os.path.join(ledger_dir, f"{name}-ledger-{run_id}")
    entries = ledger_entries(df, uid_col, prefix)
    entries.write.mode("overwrite").format(fmt).save(path)
    return path


def _list_runs(ledger_dir: str, name: str,
               spark: SparkSession | None) -> list[str]:
    """Sorted run paths for one job. With a SparkSession, listing goes
    through the Hadoop FileSystem API so it works wherever
    ``write_ledger`` wrote (HDFS/S3/local); without one it falls back
    to a local-filesystem glob (fine for tests and local runs, blind
    to remote URIs)."""
    if spark is None:
        return sorted(glob.glob(os.path.join(ledger_dir,
                                             f"{name}-ledger-*")))
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        os.path.join(ledger_dir, f"{name}-ledger-*"))
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jpath.getFileSystem(conf)
    # full URI string (keeps scheme+bucket — s3a://… must round-trip
    # into spark.read / Path()); run names share a prefix, so name
    # sort order is unchanged
    return sorted(str(st.getPath()) for st in fs.globStatus(jpath) or [])


def latest_ledger_path(ledger_dir: str, name: str,
                       spark: SparkSession | None = None) -> str | None:
    """≙ LedgerRegistry.php:106-124: glob ``<name>-ledger-*``, max by
    name. Pass ``spark`` for non-local ledger dirs (HDFS/S3) — listing
    then uses the Hadoop FileSystem API instead of a local glob."""
    hits = _list_runs(ledger_dir, name, spark)
    return hits[-1] if hits else None


def read_latest_ledger(spark: SparkSession, ledger_dir: str, name: str,
                       fmt: str = "json") -> DataFrame | None:
    """≙ LedgerRegistry.php:93-129: latest run's ledger as a DataFrame
    (None when the dependency never ran)."""
    path = latest_ledger_path(ledger_dir, name, spark)
    if path is None:
        return None
    return spark.read.format(fmt).load(path)


def prune_ledgers(ledger_dir: str, name: str, keep_last: int = 3,
                  spark: SparkSession | None = None) -> list[str]:
    """Retention for a job's ledger history: every ``write_ledger``
    run leaves a timestamped ``<name>-ledger-*`` directory and only
    the newest is ever read (``latest_ledger_path``), so a job run on
    a schedule accumulates ledgers without bound. Keep the newest
    ``keep_last`` (>= 1 — the latest is lineage other jobs depend on)
    and delete the rest; returns the deleted paths. Driver-side
    directory ops only — the ledgers themselves are never read.
    Pass ``spark`` when the ledger dir is not on the local filesystem
    (HDFS/S3): listing and deletion then go through the Hadoop
    FileSystem API, matching where ``write_ledger`` wrote."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest ledger "
                         "is lineage other jobs depend on)")
    hits = _list_runs(ledger_dir, name, spark)
    doomed = hits[:-keep_last]
    if spark is None:
        import shutil
        for path in doomed:
            shutil.rmtree(path, ignore_errors=True)
    else:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        for path in doomed:
            jpath = jvm.org.apache.hadoop.fs.Path(path)
            jpath.getFileSystem(conf).delete(jpath, True)
    return doomed
