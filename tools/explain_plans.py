#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Optimization-round evidence tool (guide §1.3/§7.2): writes one
``plans/<tag>/<query>_<suffix>.txt`` per query so plan claims
("2 Exchange → 1", "SortMergeJoin → BroadcastHashJoin") are checkable
without running Spark.

Run:  python tools/explain_plans.py --tag r14 --suffix before [q1,q2,...]

Notes:
- Queries whose *construction* executes Spark jobs (the composed
  journeys wp_post_all / training_prep_all run their sink writes when
  called) are captured too — building them is the only way to get the
  plan of the frame they return — but the interesting plans for those
  are their stage constituents, which have their own rows.
- AQE means the printed plan is the initial one
  (``AdaptiveSparkPlan isFinalPlan=false``); Exchange counts and join
  strategies read from it are pre-AQE shapes.
"""

from __future__ import annotations

import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    tag, suffix = "r14", "before"
    names = None
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names = [n for n in a.split(",") if n]; i += 1

    from bench import ALL_QUERIES, BENCH_QUERIES
    from wp_etl_migration_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("explain-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    def _explain(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))

    from wp_etl_migration_spark.operators import checkpoint

    todo = names if names is not None else list(BENCH_QUERIES)
    for name in todo:
        fn, _ = ALL_QUERIES[name]
        spark.catalog.clearCache()
        # Pre-pin plan capture (VERDICT r14 #7): pinned frames
        # (localCheckpoint / reliable checkpoint) truncate lineage, so
        # the query's own after-plan shows only `Scan ExistingRDD`
        # below each pin. The observer hook in operators.checkpoint
        # hands every pin() call's UNPINNED frame here; each plan —
        # for iterative kernels that is one per loop iteration — is
        # appended to <name>_pins_<suffix>.txt.
        pin_plans: list[str] = []
        checkpoint.PLAN_OBSERVER = \
            lambda df: pin_plans.append(_explain(df))
        try:
            df = fn(spark, sf_dir)
            plan = _explain(df)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        finally:
            checkpoint.PLAN_OBSERVER = None
        # strip volatile plan ids (#123L) noise is kept — they aid
        # reading; only normalize absolute scratch paths for diffs.
        plan = re.sub(r"file:[^\s,\]]*/(\.scratch|testdata)",
                      r"file:.../\1", plan)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        ex = plan.count("Exchange")
        extra = ""
        if pin_plans:
            ppath = os.path.join(out_dir, f"{name}_pins_{suffix}.txt")
            with open(ppath, "w") as fh:
                for i, p in enumerate(pin_plans):
                    p = re.sub(
                        r"file:[^\s,\]]*/(\.scratch|testdata)",
                        r"file:.../\1", p)
                    fh.write(f"=== pin {i} ===\n{p}\n")
            extra = f" (+{len(pin_plans)} pre-pin plans -> {ppath})"
        print(f"{name}: {len(plan)}B, Exchange~{ex} -> {path}{extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
