"""Physical-plan scale audit as a library.

The repo's CI audit (tests/test_plan_audit.py) asserts every registry
query's plan is free of the three scale-killers; this module exposes
the same check for USER queries — call :func:`audit_plan` on any
DataFrame before promoting a pipeline to the cluster, or wrap a gate
with :func:`assert_scalable`.

The three killers, and why:

- ``CartesianProduct`` — an unkeyed shuffle cross join: O(N·M) rows
  materialized; at corpus scale this never finishes.
- ``BroadcastNestedLoopJoin`` — a per-row loop over a broadcast side;
  fine for ONE-row broadcasts (a totals frame), quadratic for
  anything bigger. Flagged so the caller decides.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan: every
  row round-trips the JVM↔Python pickle boundary (~100× slower than
  Arrow-batched ``ArrowEvalPython``/``*InPandas``, which are fine and
  not flagged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SCALE_KILLERS: tuple[str, ...] = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)


def audit_plan(df: DataFrame,
               allow: tuple[str, ...] = ()) -> list[str]:
    """Return the scale-killer node names present in ``df``'s physical
    plan (empty list = clean). ``allow`` suppresses named killers for
    plans where they are justified (e.g. a one-row totals broadcast).
    Planning only — the query is never executed.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [bad for bad in SCALE_KILLERS
            if bad not in allow and bad in plan]


def assert_scalable(df: DataFrame,
                    allow: tuple[str, ...] = ()) -> DataFrame:
    """Raise ``ValueError`` naming the offending plan nodes if
    :func:`audit_plan` finds any; otherwise return ``df`` unchanged —
    drop-in guard for pipeline code: ``assert_scalable(build_query())``.
    """
    found = audit_plan(df, allow)
    if found:
        raise ValueError(
            f"plan contains scale-killers {found}; rewrite the query "
            "(equi-join keys, broadcast only dimension tables, Arrow "
            "UDFs) or pass allow=(...) with a written justification")
    return df
