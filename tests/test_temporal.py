"""Unit tests for operators/temporal — semantics the oracle queries
don't reach: forward direction, tolerance bound, duplicate-(key,ts)
determinism, inner range join, and plan shape (no nested-loop join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01T10:00:00")),
         (2, "a", _ts("2024-01-01T12:00:00")),
         (3, "b", _ts("2024-01-01T09:00:00"))],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01T09:30:00"), 100),
         ("a", _ts("2024-01-01T11:00:00"), 200),
         ("b", _ts("2024-01-01T09:30:00"), 300)],
        "k string, ts timestamp, v int")
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], payload=["v"])
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None}


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], payload=["v"],
                    direction="forward")
    got = {r.id: r.v for r in out.collect()}
    assert got == {1: 200, 2: None, 3: 300}


def test_asof_tie_matches_inclusive(spark):
    left, right = _frames(spark)
    tied = left.withColumn(
        "ts", F.lit(_ts("2024-01-01T09:30:00")).cast("timestamp"))
    out = asof_join(tied, right, on=["k"], payload=["v"])
    assert {r.v for r in out.collect()} == {100, 300}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], payload=["v"],
                    tolerance=F.expr("INTERVAL 45 MINUTES"))
    got = {r.id: r.v for r in out.collect()}
    # id=1 gap 30min kept; id=2 gap 1h dropped; id=3 never matched
    assert got == {1: 100, 2: None, 3: None}


def test_asof_duplicate_right_ts_deterministic(spark):
    left, right = _frames(spark)
    dup = right.unionByName(spark.createDataFrame(
        [("a", _ts("2024-01-01T09:30:00"), 150)],
        "k string, ts timestamp, v int"))
    out = asof_join(left, right=dup, on=["k"], payload=["v"])
    # greatest payload struct per (k, ts) wins, every run
    assert {r.id: r.v for r in out.collect()}[1] == 150


def test_asof_plan_has_no_nested_loop(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, on=["k"], payload=["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_inner_and_left(spark):
    points = spark.createDataFrame(
        [("a", _ts("2024-01-01T10:30:00"), 1),
         ("a", _ts("2024-01-01T13:00:00"), 2),
         ("b", _ts("2024-01-01T10:30:00"), 3)],
        "k string, pts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("a", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"), 10),
         ("a", _ts("2024-01-01T14:00:00"), _ts("2024-01-01T15:00:00"), 20)],
        "k string, s timestamp, e timestamp, iid int")
    inner = range_join(points, intervals, on=["k"], point_ts="pts",
                       start="s", end="e")
    assert [(r.iid, r.pid) for r in inner.collect()] == [(10, 1)]

    left = range_join(points, intervals, on=["k"], point_ts="pts",
                      start="s", end="e", how="left")
    got = sorted((r.iid, r.pid) for r in left.collect())
    assert got == [(10, 1), (20, None)]


def test_range_join_boundary_semantics(spark):
    points = spark.createDataFrame(
        [("a", _ts("2024-01-01T10:00:00"), 1),
         ("a", _ts("2024-01-01T11:00:00"), 2)],
        "k string, pts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("a", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"), 10)],
        "k string, s timestamp, e timestamp, iid int")
    open_start = range_join(points, intervals, on=["k"], point_ts="pts",
                            start="s", end="e")
    assert [r.pid for r in open_start.collect()] == [2]
    closed = range_join(points, intervals, on=["k"], point_ts="pts",
                        start="s", end="e", open_start=False)
    assert sorted(r.pid for r in closed.collect()) == [1, 2]


def test_asof_join_nearest(spark):
    """nearest = closer of backward/forward; backward wins exact ties;
    tolerance bounds each candidate before the choice."""
    from pyspark.sql import functions as F
    from wp_etl_migration_spark.operators.temporal import asof_join
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", "early"),
         ("k", "2024-01-01 10:10:00", "late")],
        ["k", "ts", "tag"]).withColumn("ts", F.col("ts").cast("timestamp"))
    mk = lambda t: spark.createDataFrame([("k", t)], ["k", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    def near(t, **kw):
        return asof_join(mk(t), right, ["k"], direction="nearest",
                         **kw).first()["tag"]
    assert near("2024-01-01 10:03:00") == "early"     # 3min vs 7min
    assert near("2024-01-01 10:08:00") == "late"      # 8min vs 2min
    assert near("2024-01-01 10:05:00") == "early"     # exact tie: backward
    assert near("2024-01-01 09:00:00") == "early"     # only forward exists
    assert near("2024-01-01 11:00:00") == "late"      # only backward exists
    assert near("2024-01-01 10:08:00",
                tolerance=F.expr("INTERVAL 1 MINUTE")) is None
    assert near("2024-01-01 10:09:30",
                tolerance=F.expr("INTERVAL 1 MINUTE")) == "late"


# ------------------------------------------------- property-based edges
# Hypothesis vs pandas merge_asof / brute force: exact-tie nearest
# choice, duplicate (key, ts) right rows, intervals spanning many
# buckets, zero-width intervals.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])

_T0 = dt.datetime(2024, 1, 1)

# Small offset range on purpose: exact left==right timestamp ties and
# duplicate (key, ts) right rows must occur often.
_OFF = st.integers(0, 40)
_KEY = st.sampled_from(["a", "b"])


def _sec(s):
    return _T0 + dt.timedelta(seconds=int(s))


@given(
    left=st.lists(st.tuples(_KEY, _OFF), min_size=1, max_size=10),
    right=st.lists(st.tuples(_KEY, _OFF, st.integers(0, 4)),
                   min_size=0, max_size=10),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
@settings(**PROP_SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, left, right, direction):
    """All three directions vs pandas merge_asof, including exact ties
    (nearest: backward wins equal distances) and duplicate (key, ts)
    right rows (greatest payload wins — mirrored by sorting the pandas
    right frame so the last duplicate is the greatest)."""
    import pandas as pd

    ldf = spark.createDataFrame(
        [(i, k, _sec(s)) for i, (k, s) in enumerate(left)],
        "id long, k string, ts timestamp")
    rdf = spark.createDataFrame(
        [(k, _sec(s), v) for (k, s, v) in right],
        "k string, ts timestamp, v int")
    got = {r.id: r.v for r in
           asof_join(ldf, rdf, on=["k"], payload=["v"],
                     direction=direction).collect()}

    # Spark got the RAW duplicates (exercising the greatest-payload tie
    # rule); pandas gets a max-deduped right frame — semantically
    # identical under that rule, and unambiguous for merge_asof (whose
    # own duplicate pick varies by direction).
    best: dict = {}
    for k, s, v in right:
        best[(k, s)] = max(best.get((k, s), v), v)
    if not best:
        assert got == {i: None for i in range(len(left))}
        return
    lp = (pd.DataFrame([(i, k, _sec(s)) for i, (k, s) in enumerate(left)],
                       columns=["id", "k", "ts"])
          .sort_values(["ts", "id"]).reset_index(drop=True))
    rp = (pd.DataFrame([(k, _sec(s), v) for (k, s), v in best.items()],
                       columns=["k", "ts", "v"])
          .sort_values(["ts", "v"]).reset_index(drop=True))
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
    want = {int(r.id): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()}
    assert got == want


@given(
    points=st.lists(st.tuples(_KEY, _OFF), min_size=0, max_size=10),
    # end >= start by construction; length 0 (zero-width) through 40s —
    # with 1-second buckets an interval spans up to 41 buckets.
    intervals=st.lists(st.tuples(_KEY, _OFF, st.integers(0, 40)),
                       min_size=0, max_size=8),
    open_start=st.booleans(),
)
@settings(**PROP_SETTINGS)
def test_range_join_matches_brute_force(spark, points, intervals,
                                        open_start):
    """Bucketed band join vs brute-force predicate evaluation:
    multi-bucket spans, zero-width intervals, boundary inclusivity."""
    pdf = spark.createDataFrame(
        [(i, k, _sec(s)) for i, (k, s) in enumerate(points)],
        "pid long, k string, ts timestamp")
    idf = spark.createDataFrame(
        [(j, k, _sec(s), _sec(s + ln))
         for j, (k, s, ln) in enumerate(intervals)],
        "iid long, k string, lo timestamp, hi timestamp")
    got = {(r.iid, r.pid) for r in
           range_join(pdf, idf, on=["k"], point_ts="ts",
                      start="lo", end="hi", bucket_width="1 second",
                      open_start=open_start).collect()}
    want = set()
    for j, (ik, s, ln) in enumerate(intervals):
        for i, (pk, ps) in enumerate(points):
            if pk != ik:
                continue
            lo_ok = (ps > s) if open_start else (ps >= s)
            if lo_ok and ps <= s + ln:
                want.add((j, i))
    assert got == want
