"""Quarantine (per-row error isolation as dataflow, SURVEY §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.quarantine import (
    quarantine_stage, split_quarantine, with_error_flags)


def _df(spark):
    return spark.createDataFrame(
        [(1, "a@x.com", 10), (2, None, 5), (3, "bad", -1), (4, "d@x.com", 0)],
        "id long, email string, qty long")


def _checks():
    return {
        "email_format": F.col("email").rlike("^[^@]+@[^@]+$"),
        "qty_nonneg": F.col("qty") >= 0,
    }


def test_error_flags(spark):
    out = {r["id"]: list(r["__errors"])
           for r in with_error_flags(_df(spark), _checks()).collect()}
    assert out == {1: [], 2: ["email_format"],
                   3: ["email_format", "qty_nonneg"], 4: []}


def test_split(spark):
    clean, bad = split_quarantine(_df(spark), _checks())
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    assert "__errors" not in clean.columns
    assert sorted(r["id"] for r in bad.collect()) == [2, 3]
    assert "__errors" in bad.columns


def test_quarantine_stage_writes_and_passes(spark, tmp_path):
    qpath = str(tmp_path / "quarantine")
    clean = quarantine_stage(_df(spark), _checks(), quarantine_path=qpath)
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    back = spark.read.parquet(qpath)
    assert sorted(r["id"] for r in back.collect()) == [2, 3]
    # Append semantics: a second failing batch accumulates for replay.
    quarantine_stage(_df(spark), _checks(), quarantine_path=qpath)
    assert spark.read.parquet(qpath).count() == 4
