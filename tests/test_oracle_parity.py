"""Replicates the driver's correctness gate locally: every registry query
runs on Spark AND its DuckDB oracle at sf=0.01; row counts, sorted column
names, and exact (order-insensitive) values must agree.

This is intentionally *stricter* than a hash compare — on mismatch it
reports the first differing rows so the query can be fixed.

This block is the suite's single largest wall-time item (~110 queries,
~3 min) and grows with every added query (VERDICT r11 #8). Every row is
marked ``parity`` and supports process-level splitting via
``PARITY_SHARD=i/N`` (stable md5-of-name assignment, exhaustive and
disjoint across shards), so CI can run e.g.::

    PARITY_SHARD=0/2 pytest -m parity &
    PARITY_SHARD=1/2 pytest -m parity &
    pytest -m "not parity"

in parallel processes (each gets its own Spark session) with identical
total coverage. Unset (the default), one process runs all rows —
behavior unchanged.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pytest

from wp_etl_migration_spark.queries import REGISTRY, EXTRA_REGISTRY
from tests.conftest import SF_DIR

ALL_QUERIES = {**REGISTRY, **EXTRA_REGISTRY}


def _shard_of(name: str, n: int) -> int:
    return int(hashlib.md5(name.encode()).hexdigest(), 16) % n


def _in_shard(name: str) -> bool:
    spec = os.environ.get("PARITY_SHARD")
    if not spec:
        return True
    i, n = (int(x) for x in spec.split("/"))
    if not 0 <= i < n:
        raise ValueError(f"PARITY_SHARD={spec}: need 0 <= i < N")
    return _shard_of(name, n) == i

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{SF_DIR}/{t}.parquet'")
    return con


def _canon_duck_type(t: str):
    """DuckDB column type → numeric family string (None = not numeric).

    Mirrors duckdb's Arrow conversion, which is what the driver hashes:
    HUGEINT (the silent result type of sum(BIGINT)) becomes
    decimal128(38,0), NOT int64 — repr()-based value compares can't see
    that, so we check it structurally."""
    t = t.upper()
    if t in ("TINYINT", "UTINYINT", "SMALLINT", "USMALLINT",
             "INTEGER", "UINTEGER", "BIGINT", "UBIGINT"):
        # int widths hash equal under the driver (r1 evidence:
        # ivf_ann_topk rank i32-vs-i64 passed); only int-vs-decimal bites
        return "int"
    if t == "HUGEINT":
        return "dec(38,0)"
    if t == "FLOAT":
        return "f32"
    if t == "DOUBLE":
        return "f64"
    if t.startswith("DECIMAL"):
        return "dec" + t[len("DECIMAL"):].replace(" ", "")
    return None


def _canon_spark_type(dt):
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                       T.LongType)):
        return "int"
    if isinstance(dt, T.FloatType):
        return "f32"
    if isinstance(dt, T.DoubleType):
        return "f64"
    if isinstance(dt, T.DecimalType):
        return f"dec({dt.precision},{dt.scale})"
    return None


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def test_parity_shards_are_exhaustive_and_disjoint():
    """Any N splits the parity rows into non-empty shards whose union
    is exactly the full query set — no row can be silently skipped by
    a sharded CI layout."""
    names = [n for n, (_, s) in ALL_QUERIES.items() if s is not None]
    for n_shards in (2, 3, 4):
        shards = [{x for x in names if _shard_of(x, n_shards) == i}
                  for i in range(n_shards)]
        assert all(shards), f"N={n_shards}: an empty shard"
        assert set().union(*shards) == set(names)
        assert sum(len(s) for s in shards) == len(names)  # disjoint


@pytest.mark.parity
@pytest.mark.parametrize("name", [n for n, (_, sql) in ALL_QUERIES.items()
                                  if sql is not None and _in_shard(n)])
def test_oracle_parity(spark, name):
    fn, sql = ALL_QUERIES[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")

    duck_types = {r[0]: _canon_duck_type(r[1])
                  for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    for f in sdf.schema.fields:
        st, dt = _canon_spark_type(f.dataType), duck_types.get(f.name)
        assert st == dt, (
            f"{name}.{f.name}: numeric dtype mismatch spark={st} "
            f"duck={dt} — the driver hashes typed values; align with CAST")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")

    s_norm = _norm_rows(spark_cols, spark_rows)
    d_norm = _norm_rows(duck_cols, duck_rows)
    if s_norm != d_norm:
        diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
