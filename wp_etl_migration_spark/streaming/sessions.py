"""Custom stateful streaming: gap-based sessionization.

``applyInPandasWithState`` — the engine's extension point for operators
Structured Streaming lacks natively (per-key custom state machines).
Sessionization: per user, events within ``gap`` of each other belong to
one session; a session closes when the watermark passes its last event
plus the gap (event-time timeout), emitting one summary row.

State per key is O(1) (open-session aggregates only — not the event
list), so state size is bounded by active keys regardless of throughput.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType, TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

#: (start_us, end_us, n_events, sum_value) of the open session.
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
    StructField("sum_value", DoubleType()),
])

_GAP_US = 30 * 60 * 1_000_000


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def sessionize(events: DataFrame, gap_us: int = _GAP_US,
               watermark: str = "2 hours") -> DataFrame:
    """Per-user gap sessionization over a stream (or batch) of events."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n, "sum_value": sv}])
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        cur = list(state.get) if state.exists else None
        for ts, value in zip(rows["ts"], rows["value"]):
            t = _us(ts)
            if cur is not None and t - cur[1] > gap_us:
                out.append(cur)
                cur = None
            if cur is None:
                cur = [t, t, 0, 0.0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(value)
        if cur is not None:
            state.update(tuple(cur))
            # Close when event time passes session end + gap (timeout
            # timestamps are in epoch millis).
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if out:
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(s, unit="us"),
                "session_end": pd.Timestamp(e, unit="us"),
                "n_events": n, "sum_value": sv}
                for s, e, n, sv in out])

    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def sessionize_batch(events: DataFrame, gap_us: int = _GAP_US) -> DataFrame:
    """Batch-mode sessionization with identical semantics (lag + cumulative
    session ids over a window) — the oracle for the streaming operator and
    the backfill path. One shuffle on user_id."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (F.unix_micros("ts")
           - F.lag(F.unix_micros("ts")).over(w)) > gap_us
    sess = (events
            .withColumn("__new", F.when(gap, 1).otherwise(0))
            .withColumn("__sid", F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "__sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .drop("__sid"))
