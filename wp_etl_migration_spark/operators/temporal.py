"""Temporal joins Spark lacks as built-ins: as-of join and point-in-
interval (band/range) join.

The reference has no temporal joins at all (SURVEY §2.4 — its joins are
per-row WordPress lookups); these belong to the beyond-reference
training-pipeline surface, where event attribution ("most recent prior
click for this purchase") and windowed correlation ("errors in the hour
before each purchase") are everyday operations.

Both operators are built so the plan scales: **one shuffle on the equi
keys, no row explosion beyond a constant factor** — never a
BroadcastNestedLoopJoin / cartesian refine, which is what a naive
``l.join(r, (keys) & (l.ts >= r.ts))`` degenerates into on Spark.

As-of join — union + running ``last(ignorenulls)``:
    Tag right rows 0 and left rows 1, union them, and take the running
    last right payload over a window partitioned by the keys and ordered
    by (ts, tag).  Each input row is touched once, so cost is
    O((|L|+|R|) log) within a single hash partition by key — the same
    merge-scan an ASOF join does in DuckDB/kdb, expressed with Spark
    primitives (exchange + window sort) so AQE still handles skew.

Range join — bucketed band join:
    Intervals explode into the fixed-width buckets they overlap, points
    map to one bucket, and the join becomes an equi-join on
    (keys…, bucket) refined by the exact predicate.  With bucket width
    chosen ≥ the typical interval length each interval lands in ≤ 2
    buckets, so the shuffle grows by at most 2× while the matcher stays
    a hash join Catalyst/AQE can plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAY = "__asof_payload"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload: Sequence[str] = (),
              direction: str = "backward",
              tolerance: Column | None = None) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` (``backward``; ties match) or smallest
    ``right_ts`` ≥ ``left_ts`` (``forward``) sharing the ``on`` keys.

    Left rows without a match keep null payload columns (left-join
    semantics).  ``payload`` columns must not collide with left column
    names.  ``tolerance`` (a Column interval/µs bound) drops matches
    further than the bound from the left timestamp.

    Right rows with duplicate (keys, ts) are resolved deterministically
    — the greatest payload struct wins — by ordering ties on the payload
    inside the window, so no dedup pre-aggregation (and no second
    shuffle) is needed: the whole join is ONE exchange on the keys.

    ``direction="nearest"`` attaches whichever of the backward/forward
    candidates is closer in time (backward wins exact-distance ties,
    matching pandas ``merge_asof``). Implementation is two window sorts
    over the SAME key exchange — Catalyst reuses the shuffle, so the
    plan stays one exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest: {direction}")
    payload = list(payload) or [
        c for c in right.columns if c not in on and c != right_ts]

    r = (right.select(
        *on, F.col(right_ts).alias(_TS),
        F.struct(F.col(right_ts).alias("__rts"),
                 F.struct(*payload).alias("__p")).alias(_PAY))
        .withColumn(_SIDE, F.lit(0)))
    pay_type = r.schema[_PAY].dataType

    l = (left
         .withColumn(_TS, F.col(left_ts))
         .withColumn(_SIDE, F.lit(1))
         .withColumn(_PAY, F.lit(None).cast(pay_type)))

    merged = l.unionByName(r, allowMissingColumns=True)

    from pyspark.sql import Window

    def running_last(ts_ord):
        # Ties: right (0) before left (1) so equal timestamps match, and
        # payload ascending so the greatest duplicate is the running last.
        w = (Window.partitionBy(*on)
             .orderBy(ts_ord, F.col(_SIDE).asc(), F.col(_PAY).asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        return F.last(_PAY, ignorenulls=True).over(w)

    def bounded(pay_col):
        if tolerance is None:
            return pay_col
        gap = F.abs(F.unix_micros(F.col(_TS)) -
                    F.unix_micros(pay_col.getField("__rts")))
        bound = F.unix_micros(
            F.lit("1970-01-01 00:00:00").cast("timestamp") + tolerance)
        return F.when(gap <= bound, pay_col)

    if direction in ("backward", "forward"):
        ts_ord = F.col(_TS).asc() if direction == "backward" else \
            F.col(_TS).desc()
        matched = (merged
                   .withColumn(_PAY, running_last(ts_ord))
                   .filter(F.col(_SIDE) == 1)
                   .withColumn(_PAY, bounded(F.col(_PAY))))
    else:
        # nearest: both directional candidates from the SAME key
        # exchange (two window sorts, one shuffle); per row keep the
        # closer candidate, backward winning exact-distance ties —
        # pandas merge_asof semantics. Tolerance bounds each candidate
        # BEFORE the choice, also matching pandas.
        matched = (merged
                   .withColumn("__pb", running_last(F.col(_TS).asc()))
                   .withColumn("__pf", running_last(F.col(_TS).desc()))
                   .filter(F.col(_SIDE) == 1)
                   .withColumn("__pb", bounded(F.col("__pb")))
                   .withColumn("__pf", bounded(F.col("__pf"))))
        gap_b = F.unix_micros(F.col(_TS)) - \
            F.unix_micros(F.col("__pb.__rts"))
        gap_f = F.unix_micros(F.col("__pf.__rts")) - \
            F.unix_micros(F.col(_TS))
        matched = matched.withColumn(
            _PAY,
            F.when(F.col("__pf").isNull(), F.col("__pb"))
            .when(F.col("__pb").isNull(), F.col("__pf"))
            .when(gap_b <= gap_f, F.col("__pb"))
            .otherwise(F.col("__pf")))

    return matched.select(
        *left.columns,
        *[F.col(f"{_PAY}.__p.{c}").alias(c) for c in payload])


def range_join(points: DataFrame, intervals: DataFrame, on: Sequence[str],
               point_ts: str, start: str, end: str,
               bucket_width: str = "1 hour",
               open_start: bool = True,
               how: str = "inner") -> DataFrame:
    """Join point rows to interval rows sharing ``on`` keys where
    ``start < point_ts <= end`` (``open_start``) or
    ``start <= point_ts <= end``.

    Implemented as a bucketed band join (module docstring): intervals
    fan out to every ``bucket_width`` bucket they overlap, points hash
    to one bucket, so the matcher is a pure equi-join on
    (keys…, bucket) plus a cheap refine filter.  ``how`` of ``left``
    keeps unmatched intervals (one null-point row each).
    """
    width_us = F.unix_micros(
        F.lit("1970-01-01 00:00:00").cast("timestamp")
        + F.expr(f"INTERVAL {bucket_width}"))

    b_pt = (F.unix_micros(F.col(point_ts)) / width_us).cast("long")
    b_lo = (F.unix_micros(F.col(start)) / width_us).cast("long")
    b_hi = (F.unix_micros(F.col(end)) / width_us).cast("long")

    pts = points.withColumn("__bucket", b_pt)
    ivs = (intervals
           .withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi))))

    cmp_lo = (F.col(point_ts) > F.col(start)) if open_start else \
        (F.col(point_ts) >= F.col(start))
    refine = cmp_lo & (F.col(point_ts) <= F.col(end))

    keys = [*on, "__bucket"]
    if how == "inner":
        return ivs.join(pts, keys, "inner").filter(refine) \
            .drop("__bucket")
    if how != "left":
        raise ValueError(f"how must be inner/left: {how}")
    matched = ivs.join(pts, keys, "inner").filter(refine).drop("__bucket")
    pt_cols = [c for c in points.columns if c not in on]
    missing = (intervals.join(
        matched.select(*intervals.columns).distinct(),
        intervals.columns, "left_anti"))
    for c in pt_cols:
        missing = missing.withColumn(
            c, F.lit(None).cast(dict(points.dtypes)[c]))
    return matched.unionByName(missing)
