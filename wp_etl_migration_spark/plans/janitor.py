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


def _staging_path(path: str) -> str:
    """Dot-prefixed staging sibling of ``path``. String surgery, not
    os.path.split: for a root-level dataset (``/data``) split gives
    base ``/`` and joining produced ``//._staging_data``, which Hadoop
    URI parsing reads as an authority (host ``._staging_data``) — a
    different filesystem location (r13 ADVICE). Keeping the exact
    prefix up to the final segment preserves ``/``, ``s3://bucket/``,
    and relative prefixes alike."""
    stripped = path.rstrip("/")
    name = stripped.rpartition("/")[2]
    return stripped[:len(stripped) - len(name)] + f"._staging_{name}"


def _fs_and_path(spark: SparkSession, uri: str):
    jpath = spark.sparkContext._jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def _staging_complete(fs, jvm, staging: str) -> bool:
    """A staging write is complete iff Spark's job-commit marker is
    present (``_SUCCESS``, written last by the output committer)."""
    return fs.exists(jvm.org.apache.hadoop.fs.Path(
        staging.rstrip("/") + "/_SUCCESS"))


def recover_dataset(spark: SparkSession, path: str) -> bool:
    """Finish (or discard) a :func:`rewrite_dataset` swap a crash
    interrupted; returns True when the target was restored.

    A leftover ``._staging_<name>`` sibling is diagnosed by its
    ``_SUCCESS`` marker: present ⇒ the staging write committed and
    staging holds the full surviving rows while the target may be
    partial — complete the swap (delete target remnants, rename
    staging in; both metadata ops, each re-runnable if THIS crashes
    too). Absent ⇒ the crash hit mid-staging-write and the target was
    never touched — drop the garbage staging and report False.
    Callers that derive a new rewrite from the target
    (``sinks.training.purge_training_shards``) run this before
    READING the target, so a crashed prior purge can never feed a
    truncated shard back into the next one."""
    staging = _staging_path(path)
    fs, jstaging = _fs_and_path(spark, staging)
    if not fs.exists(jstaging):
        return False
    jvm = spark.sparkContext._jvm
    jtarget = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    if not _staging_complete(fs, jvm, staging):
        fs.delete(jstaging, True)
        return False
    if fs.exists(jtarget):
        fs.delete(jtarget, True)
    if not fs.rename(jstaging, jtarget):
        raise RuntimeError(f"recovery rename {staging} -> {path} "
                           "failed; staging kept")
    return True


def rewrite_dataset(spark: SparkSession, path: str, survivors: DataFrame,
                    fmt: str = "parquet") -> None:
    """Staged-swap rewrite of a file dataset with the surviving rows.

    Materializes survivors to a staging sibling first (they usually
    derive from the dataset being overwritten), then swaps the
    directories with filesystem metadata ops — delete target, rename
    staging in — instead of a second full Spark write (r14; the old
    read-staging-overwrite-target swap paid the data pass twice AND
    could crash mid-overwrite leaving a truncated target as the only
    copy). Every crash window now converges: die during the staging
    write and the target is untouched (the incomplete staging carries
    no ``_SUCCESS``); die between delete and rename and staging still
    holds the full surviving rows — :func:`recover_dataset` finishes
    the swap either way. A leftover staging dir on entry means exactly
    such an unfinished swap, and proceeding would rebuild survivors
    from a possibly-truncated target, so it raises instead (run
    :func:`recover_dataset` first).

    The staging dir is dot-prefixed (readers' partition/file discovery
    skips it even mid-swap — required when ``path`` is one ``key=val``
    directory of a hive-partitioned export, as in
    ``sinks.training.purge_training_shards``). On object stores
    without native rename (S3A) the rename degrades to a server-side
    copy — still no worse than the old second write, and the
    staging-until-committed contract is unchanged."""
    staging = _staging_path(path.rstrip("/"))
    fs, jstaging = _fs_and_path(spark, staging)
    if fs.exists(jstaging):
        raise RuntimeError(
            f"stale staging dir {staging} — a previous rewrite of "
            f"{path} crashed mid-swap; run recover_dataset() to "
            "restore the target from it before rewriting again")
    survivors.write.mode("overwrite").format(fmt).save(staging)
    jvm = spark.sparkContext._jvm
    jtarget = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    if fs.exists(jtarget):
        fs.delete(jtarget, True)
    if not fs.rename(jstaging, jtarget):
        raise RuntimeError(f"swap rename {staging} -> {path} failed; "
                           "staging kept for recover_dataset()")


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
