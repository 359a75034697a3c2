"""Filter gates with single-pass observability (LLM-pipeline extension).

A curation pipeline at corpus scale needs per-rule drop counts — "how
many docs did the language gate kill vs the quality gate" — but the
naive way (one ``count()`` per rule) re-scans the input N times. Here
the rule counters ride an ``Observation`` node measured during whatever
action materializes the filtered result: one pass, zero extra jobs,
exact counts (CollectMetrics is computed pre-filter on every row).

No counterpart in the reference (its per-row loaders log skips
imperatively); this is the declarative translation.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def apply_gates(df: DataFrame, gates: dict[str, Column],
                ) -> tuple[DataFrame, Observation]:
    """Keep rows passing EVERY gate; observe per-gate failure counts.

    Returns ``(filtered_df, observation)``. The observation resolves
    after the first action on ``filtered_df`` with metrics ``total``
    (input rows), ``kept``, and one ``dropped_<name>`` per gate — a
    row failing several gates counts against each (the sum of
    ``dropped_*`` can exceed ``total − kept``). NULL gate results count
    as failures, matching WHERE semantics.
    """
    if not gates:
        raise ValueError("at least one gate required")
    passed = functools.reduce(
        operator.and_, [g.isNotNull() & g for g in gates.values()])
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("total"),
               F.count(F.when(passed, 1)).alias("kept")]
    metrics += [
        F.count(F.when(~(g.isNotNull() & g), 1)).alias(f"dropped_{name}")
        for name, g in gates.items()]
    out = df.observe(obs, *metrics).where(passed)
    return out, obs
