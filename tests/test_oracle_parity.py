"""Replicates the driver's correctness gate locally: every registry query
runs on Spark AND its DuckDB oracle at sf=0.01; row counts, sorted column
names, and exact (order-insensitive) values must agree.

This is intentionally *stricter* than a hash compare — on mismatch it
reports the first differing rows so the query can be fixed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from wp_etl_migration_spark.queries import REGISTRY
from tests.conftest import SF_DIR

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", [n for n, (_, sql) in REGISTRY.items()
                                  if sql is not None])
def test_oracle_parity(spark, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")

    s_norm = _norm_rows(spark_cols, spark_rows)
    d_norm = _norm_rows(duck_cols, duck_rows)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
