"""Watermarked stream-stream interval join.

The streaming twin of ``operators/temporal.range_join``: correlate two
unbounded event streams on equi keys within a bounded event-time gap
(e.g. "clicks at most an hour before the purchase").  The time-range
predicate is what makes this tractable at scale — it gives the state
store a provable eviction bound (watermark + interval), so state does
not grow with the stream.  Without it Spark would have to buffer both
sides forever.

Reference has no streaming at all (SURVEY §2.9); beyond-reference
surface.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                  left_ts: str, right_ts: str,
                  within: str = "1 HOUR",
                  watermark: str = "2 hours") -> DataFrame:
    """Inner-join rows of two streams sharing ``on`` keys where
    ``left_ts - within <= right_ts <= left_ts``.

    Both inputs may be streaming or batch (batch inputs make this the
    exact batch-equivalent plan, handy for parity tests).  Column names
    other than ``on`` must be disjoint.  Watermarks bound join state:
    a right row can be evicted once the left watermark passes
    ``right_ts + within``.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)

    # Aliases keep the key equality unambiguous when both sides derive
    # from the same scan (batch self-join parity path).
    l, r = left.alias("__ij_l"), right.alias("__ij_r")
    lc = lambda c: F.col(f"__ij_l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"__ij_r.{c}")  # noqa: E731

    keys: Column = reduce(lambda a, b: a & b,
                          [lc(k) == rc(k) for k in on])
    bound = (
        (rc(right_ts) <= lc(left_ts)) &
        (rc(right_ts) >= lc(left_ts) - F.expr(f"INTERVAL {within}")))
    joined = l.join(r, keys & bound, "inner")
    return joined.drop(*[rc(k) for k in on])
