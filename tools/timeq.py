#!/usr/bin/env python
"""Time named headline queries in isolation (optimization dev loop).

Same methodology as bench.py's run_one — clearCache before each
execution, noop sink, monotonic wall — but only the named queries,
``--reps N`` executions each (min + all samples printed), after the
same warmup block semantics (one tiny scan+agg; the full bench warmups
matter for first-execution floors, not for A/B deltas where both sides
pay the same warm state). Use bench.py for committed numbers; this is
the fast inner loop.

Run:  python tools/timeq.py trigram_lm_div,bigram_lm_score --reps 3
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    names: list[str] = []
    reps = 3
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        else:
            names += [n for n in args[i].split(",") if n]; i += 1
    from bench import ALL_QUERIES
    from wp_etl_migration_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    # minimal warm: codegen + executor pool
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.groupBy("r_name").count().write.format("noop") \
        .mode("overwrite").save()
    rng = spark.range(0, 3200, 1, 32)
    rng.mapInPandas(lambda it: it, schema="id long") \
        .write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn, _ = ALL_QUERIES[name]
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
