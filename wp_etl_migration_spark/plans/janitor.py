"""Janitor: preview + bulk rollback of loaded data (SURVEY §5).

≙ lib/Commands/JanitorCommand.php:117-314 — ``empty-posts`` /
``empty-terms`` delete migrated rows in batches after a SQL COUNT
preview (``:132-137``, ``:244-249``). On immutable datasets "delete"
is a filtered rewrite: one anti-join/predicate scan, atomic swap via
overwrite — no row-at-a-time batching needed (Spark partitions the
rewrite; the reference batches only because MySQL row deletes are
serial).

Targeting mirrors the reference: rows are selected either by predicate
(post_type / created-after) or by the migration's own ledger (the audit
trail of what a job loaded — the safer rollback key).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wp_etl_migration_spark.sinks.ledger import read_latest_ledger


def preview_delete(df: DataFrame, predicate: Column) -> int:
    """≙ the janitor's COUNT(*) confirmation prompt."""
    return df.where(predicate).count()


def delete_where(df: DataFrame, predicate: Column) -> DataFrame:
    """Survivors after deleting rows matching ``predicate``."""
    return df.where(~F.coalesce(predicate, F.lit(False)))


def delete_by_ledger(spark: SparkSession, df: DataFrame, key: str,
                     ledger_dir: str, job_name: str,
                     ledger_key: str | None = None) -> DataFrame:
    """Roll back exactly the rows a job loaded: anti-join the target
    against the job's latest ledger on the lineage key."""
    led = read_latest_ledger(spark, ledger_dir, job_name)
    if led is None:
        return df
    lk = ledger_key or key
    return df.join(led.select(F.col(lk).alias(key)).distinct(),
                   on=key, how="left_anti")


def rewrite_dataset(spark: SparkSession, path: str, survivors: DataFrame,
                    fmt: str = "parquet") -> None:
    """Atomic-swap rewrite of a file dataset with the surviving rows.

    Materializes survivors to a staging path first (they usually derive
    from the dataset being overwritten), then swaps.

    The staging dir is dot-prefixed (readers' partition/file discovery
    skips it even mid-swap — required when ``path`` is one ``key=val``
    directory of a hive-partitioned export, as in
    ``sinks.training.purge_training_shards``) and removed after the
    swap (r13; it previously leaked a ``.__staging__`` sibling per
    rewrite). Removal goes through the Hadoop FileSystem API so remote
    URIs clean up too."""
    import os as _os
    base, name = _os.path.split(path.rstrip("/"))
    staging = (base + "/" if base else "") + f"._staging_{name}"
    survivors.write.mode("overwrite").format(fmt).save(staging)
    spark.read.format(fmt).load(staging) \
        .write.mode("overwrite").format(fmt).save(path)
    jpath = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(staging)
    jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ).delete(jpath, True)


def snapshot_dataset(path: str, tag: str = "pre_migration") -> str:
    """Snapshot a file dataset before a destructive operation.

    ≙ ProcessCommand.php:345-362 — the reference wraps a migration in a
    ``wp db export`` backup and re-imports it on failure. On an immutable
    file warehouse the equivalent is a directory copy taken BEFORE the
    overwrite; returns the snapshot path for :func:`restore_dataset`.
    Existing snapshots with the same tag are replaced (one backup per
    operation, like the reference's single export file).

    Local-filesystem copy; on an object store the same contract is a
    server-side prefix copy — the call site doesn't change.
    """
    import shutil

    snap = f"{path.rstrip('/')}.__snapshot__-{tag}"
    if os.path.exists(snap):
        shutil.rmtree(snap)
    shutil.copytree(path, snap)
    return snap


def restore_dataset(path: str, snapshot: str,
                    keep_snapshot: bool = True) -> None:
    """Roll the dataset back to a snapshot (≙ the reference's failure-path
    ``db import``). The copy lands in a staging dir first so a crash
    mid-restore never leaves ``path`` half-written, then swaps."""
    import shutil

    if not os.path.isdir(snapshot):
        raise FileNotFoundError(f"no snapshot at {snapshot}")
    staging = path.rstrip("/") + ".__restore_staging__"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    shutil.copytree(snapshot, staging)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(staging, path)
    if not keep_snapshot:
        shutil.rmtree(snapshot)


def compact_dataset(spark: SparkSession, path: str,
                    fmt: str = "parquet",
                    target_file_bytes: int = 128 << 20) -> int:
    """Rewrite a fragmented dataset into ~``target_file_bytes`` files.

    The operational companion to incremental loads: many small appends
    leave a dataset with thousands of tiny files, and at 100 TB the
    per-file open cost dominates scans. Sizes the rewrite from the
    current on-disk bytes (local stat walk here; an object store lists
    the same numbers), then routes through the staging-swap rewrite so
    a crash never half-destroys the dataset. Returns the new file
    count.
    """
    import glob

    total = sum(os.path.getsize(f)
                for f in glob.glob(os.path.join(path, "**"),
                                   recursive=True)
                if os.path.isfile(f))
    n = max(1, -(-total // target_file_bytes))
    df = spark.read.format(fmt).load(path).repartition(n)
    rewrite_dataset(spark, path, df, fmt)
    return len([f for f in glob.glob(os.path.join(path, "*"))
                if os.path.isfile(f) and not f.endswith(".crc")
                and "_SUCCESS" not in f])


def list_snapshots(path: str) -> list[str]:
    """Snapshot paths taken for ``path``, sorted by tag."""
    import glob

    return sorted(glob.glob(f"{path.rstrip('/')}.__snapshot__-*"))
