"""Automated plan audit (the SCALE.md contract): every registry query's
physical plan must be free of the three scale-killers —

- ``CartesianProduct``          (unkeyed shuffle cross join)
- ``BroadcastNestedLoopJoin``   (per-row loop over a broadcast side)
- ``BatchEvalPython``           (row-at-a-time Python UDF; Arrow-batched
                                 ArrowEvalPython / *InPandas are fine)

Queries whose construction itself runs Spark jobs (k-means fit,
component rounds, max-id probes) execute them at sf0.001 here — the
audit still only *plans* the returned DataFrame, never runs it.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from wp_etl_migration_spark.queries import EXTRA_REGISTRY, REGISTRY

ALL_QUERIES = {**REGISTRY, **EXTRA_REGISTRY}

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin",
             "BatchEvalPython")

#: Allowed exceptions, each with its justification.
EXEMPT = {
    # totals frame is ONE aggregate row; broadcasting it as a nested
    # loop join is a constant-size plan node, not a scale hazard.
    "key_skew": ("BroadcastNestedLoopJoin",),
}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_plan_free_of_scale_killers(spark, name):
    fn, _ = ALL_QUERIES[name]
    df = fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed = EXEMPT.get(name, ())
    for bad in FORBIDDEN:
        if bad in allowed:
            continue
        assert bad not in plan, f"{name}: {bad} in physical plan"
