"""Single-pass observable filter gates (operators/gates.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.gates import apply_gates


def test_apply_gates_counts_and_filter(spark):
    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 3, "en"), (3, 10, "zh"), (4, 1, "fr")],
        ["id", "n", "lang"])
    out, obs = apply_gates(df, {
        "long_enough": F.col("n") >= 5,
        "lang": F.col("lang") == "en",
    })
    kept = sorted(r.id for r in out.collect())  # action resolves obs
    assert kept == [1]
    m = obs.get
    assert m["total"] == 4 and m["kept"] == 1
    assert m["dropped_long_enough"] == 2  # ids 2, 4
    assert m["dropped_lang"] == 2         # ids 3, 4


def test_apply_gates_null_fails(spark):
    df = spark.createDataFrame([(1, None), (2, 7)], ["id", "n"])
    out, obs = apply_gates(df, {"n_ok": F.col("n") > 5})
    assert [r.id for r in out.collect()] == [2]
    assert obs.get["dropped_n_ok"] == 1


def test_apply_gates_empty_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        apply_gates(df, {})
