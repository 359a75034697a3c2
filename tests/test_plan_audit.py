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
from wp_etl_migration_spark.operators.plancheck import (
    SCALE_KILLERS, audit_plan)
from wp_etl_migration_spark.queries import EXTRA_REGISTRY, REGISTRY

ALL_QUERIES = {**REGISTRY, **EXTRA_REGISTRY}

FORBIDDEN = SCALE_KILLERS

#: Allowed exceptions, each with its justification.
EXEMPT = {
    # totals frame is ONE aggregate row; broadcasting it as a nested
    # loop join is a constant-size plan node, not a scale hazard.
    "key_skew": ("BroadcastNestedLoopJoin",),
    # same pattern: the corpus token total (one row) broadcast against
    # the <= top_k vocabulary rows.
    "vocab_topk": ("BroadcastNestedLoopJoin",),
    # same pattern: the corpus doc total (one row) broadcast against
    # the per-domain count rows (operators/urls.domain_stats).
    "domain_stats": ("BroadcastNestedLoopJoin",),
}


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_plan_free_of_scale_killers(spark, name):
    fn, _ = ALL_QUERIES[name]
    df = fn(spark, SF_SMALL)
    found = audit_plan(df, allow=EXEMPT.get(name, ()))
    assert not found, f"{name}: {found} in physical plan"


def test_assert_scalable_guard(spark):
    """The library guard raises on a cross join and passes a keyed
    join through unchanged."""
    from wp_etl_migration_spark.operators.plancheck import (
        assert_scalable)
    a = spark.range(10).withColumnRenamed("id", "k")
    b = spark.range(10).withColumnRenamed("id", "k")
    good = assert_scalable(a.join(b, "k"))
    assert good.count() == 10
    # a small cross join plans as BroadcastNestedLoopJoin (build side
    # fits the broadcast threshold) — either killer must raise
    with pytest.raises(ValueError, match="scale-killers"):
        assert_scalable(a.crossJoin(b.withColumnRenamed("k", "k2")))
