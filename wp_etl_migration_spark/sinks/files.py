"""File sinks (SURVEY §2.2 L1–L4).

≙ Load AdapterFactory.php:84-170: JSON/CSV writers with overwrite-vs-
timestamped destination naming and an optional prefix pre-filter that
writes only one namespace (prefix stripped when single).

Spark-first: ``df.write`` (distributed, one file per partition). The
reference's pretty-printed single JSON document is driver-side by nature;
``write_json(single_file=True)`` reproduces it for small outputs and is
deliberately NOT the default — at scale you want many part files.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame

from wp_etl_migration_spark.operators.prefix import select_prefix


def destination(base_dir: str, name: str, ext: str,
                overwrite: bool = True) -> str:
    """Destination naming ≙ AdapterFactory.php:128-146: overwrite → fixed
    ``name.ext``; else timestamp-suffixed ``name-<unixtime>.ext``."""
    fname = f"{name}.{ext}" if overwrite else f"{name}-{int(time.time())}.{ext}"
    return os.path.join(base_dir, fname)


def _apply_prefix(df: DataFrame, prefix: str | None) -> DataFrame:
    """L4 prefix pre-filter: keep only ``prefix.*`` columns, stripped."""
    return df if prefix is None else select_prefix(df, prefix)


def write_json(df: DataFrame, path: str, mode: str = "overwrite",
               prefix: str | None = None, single_file: bool = False,
               pretty: bool = False, max_rows: int = 100_000) -> None:
    """JSON sink ≙ L1. Distributed JSONL by default.

    ``single_file + pretty`` reproduces the reference's
    ``JSON_PRETTY_PRINT`` document (AdapterFactory.php:102-107) by
    collecting through ``toJSON``. That is driver-side by nature, so it
    is guarded: more than ``max_rows`` rows raises instead of OOMing the
    driver (the guard collects at most ``max_rows + 1`` rows — no extra
    count job). Raise ``max_rows`` explicitly if you really mean it;
    for big outputs use the default distributed writer.
    """
    df = _apply_prefix(df, prefix)
    if single_file:
        strs = df.limit(max_rows + 1).toJSON().collect()
        if len(strs) > max_rows:
            raise ValueError(
                f"write_json(single_file=True) collects to the driver "
                f"and the frame exceeds max_rows={max_rows}; use the "
                f"distributed writer (single_file=False) or raise "
                f"max_rows explicitly")
        rows = [json.loads(s) for s in strs]
        with open(path, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2 if pretty else None,
                      ensure_ascii=False)
        return
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              prefix: str | None = None, header: bool = True) -> None:
    """CSV sink ≙ L2 (AdapterFactory.php:84-93)."""
    df = _apply_prefix(df, prefix)
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Parquet sink — the engine's canonical columnar output (no
    reference counterpart; file outputs there are CSV/JSON only)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    """ORC sink — the columnar-output twin of :func:`write_parquet`
    for deployments standardized on ORC (Hive-lineage warehouses)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
