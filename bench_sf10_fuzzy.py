#!/usr/bin/env python
"""sf10 spot-bench for the FastSS fuzzy-match kernel (VERDICT r13
#5): the last top-wall kernel family with sf0.1-only scale evidence.

Two axes, because the kernel has two degenerate regimes the decade
studies exist to catch:

1. **Row decade** (``--scales 1,10,100``): the q_fuzzy_match key
   recipe (triples sharing a 10-hex md5 base with 0/1/2 planted 'Z'
   substitutions — guaranteed ED-1/ED-2 pairs inside each triple,
   near-zero accidental pairs across triples) at 15k/150k/1.5M keys.
   True-pair count grows LINEARLY with rows (pairs live inside
   triples), so a healthy wall exponent is ~≤1.15 (n log n); variant
   buckets stay triple-local, so data-stage skew should sit near 1.
2. **Key-length axis** (``--keylens 10,14,18``, at the 10× row
   scale): the depth-2 deletion neighborhood is 1 + L + L(L−1)/2
   variants per key — QUADRATIC in key length. Walls are reported
   against the variant-count ratio, the honest denominator: a
   26-variant-per-key corpus vs a 190-variant one is a 7.3× fanout
   at identical row count, and the kernel should track that fanout
   roughly linearly (it is an explode + equi-join, no cross term).

Per (scale, axis point) the script records the wall AND the worst
shuffle-stage skew (max/median shuffle-read records via the Spark
REST API — shared helper from bench_sf10_dedup). One JSON line out;
min-merge across two runs for paired floors, like every rig here.

Run:  python bench_sf10_fuzzy.py [--scales 1,10,100]
      [--keylens 10,14,18] [--rows-only | --len-only]
"""

from __future__ import annotations

import json
import math
import os
import sys

from pyspark.sql import functions as F

from bench_sf10_dedup import SCRATCH_DIR, _timed_with_skew
from wp_etl_migration_spark.operators.fuzzy import fuzzy_self_join
from wp_etl_migration_spark.session import get_spark

#: keys per unit scale — one unit ≈ the sf0.1 customer count the
#: committed fuzzy_match floor measures.
BASE_KEYS = 15_000


def build_keys(spark, n_triples: int, keylen: int) -> str:
    """(id, key) parquet: ``n_triples`` triples, each sharing a
    ``keylen``-hex md5 base; member m of a triple substitutes its
    first m chars with 'Z' (m = 0, 1, 2) — every triple contains
    exact ED-1 and ED-2 pairs and 'Z' never collides with hex, so
    cross-triple accidental pairs are md5-rare. The q_fuzzy_match
    recipe (queries.py) parameterized by scale and key length."""
    out = os.path.join(SCRATCH_DIR,
                       f"fuzzy_keys_t{n_triples}_l{keylen}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    (spark.range(n_triples).withColumnRenamed("id", "triple")
     .crossJoin(F.broadcast(
         spark.range(3).withColumnRenamed("id", "m")))
     .select((F.col("triple") * 3 + F.col("m")).alias("id"),
             F.expr("concat(substring('ZZ', 1, cast(m as int)), "
                    "substring(substring(md5(cast(triple as "
                    f"string)), 1, {keylen}), cast(m as int) + 1))")
             .alias("key"))
     .repartition(32)
     .write.mode("overwrite").parquet(out))
    return out


def _n_variants(keylen: int) -> int:
    return 1 + keylen + keylen * (keylen - 1) // 2


def main(argv: list[str]) -> int:
    scales = [int(x) for x in (
        argv[argv.index("--scales") + 1].split(",")
        if "--scales" in argv else ("1", "10", "100"))]
    keylens = [int(x) for x in (
        argv[argv.index("--keylens") + 1].split(",")
        if "--keylens" in argv else ("10", "14", "18"))]
    rows_only = "--rows-only" in argv
    len_only = "--len-only" in argv
    spark = get_spark("wp-etl-sf10-fuzzy",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "sf10_fuzzy_scaling", "unit": "sec",
           "base_keys": BASE_KEYS, "scales": {}, "keylens": {}}

    def run_point(n_triples: int, keylen: int) -> dict:
        path = build_keys(spark, n_triples, keylen)
        keys = spark.read.parquet(path).localCheckpoint(eager=True)
        # ONE run per point per session (bench_sf10_dedup rationale:
        # Spark's cache manager serves identical plans on repeats)
        wall, skew = _timed_with_skew(
            spark,
            lambda: fuzzy_self_join(keys, "id", "key",
                                    max_distance=2)
            .write.format("noop").mode("overwrite").save())
        # correctness spot-check rides along: every triple yields
        # exactly 3 pairs (0-1 @1, 1-2 @1, 0-2 @2) — a wrong pair
        # count at scale means the rig, not the wall, is broken
        pairs = fuzzy_self_join(keys, "id", "key", max_distance=2)
        n_intra = (pairs.where((F.col("id_a") / 3).cast("bigint")
                               == (F.col("id_b") / 3).cast("bigint"))
                   .count())
        return {"keys": keys.count(), "wall": wall,
                "variants_per_key": _n_variants(keylen),
                "intra_triple_pairs": n_intra,
                "expected_intra": 3 * n_triples,
                "worst_skew": skew}

    if not len_only:
        for s in scales:
            out["scales"][str(s)] = run_point(
                s * BASE_KEYS // 3, keylens[0])
        exps = {}
        for lo, hi in zip(scales, scales[1:]):
            w_lo = out["scales"][str(lo)]["wall"]
            w_hi = out["scales"][str(hi)]["wall"]
            exps[f"{lo}->{hi}"] = round(
                math.log10(w_hi / w_lo) / math.log10(hi / lo), 3)
        out["wall_exponents"] = exps
    if not rows_only:
        mid = scales[min(1, len(scales) - 1)]
        for kl in keylens:
            out["keylens"][str(kl)] = run_point(
                mid * BASE_KEYS // 3, kl)
        # wall growth vs variant-fanout growth between consecutive
        # key lengths: ≈1 means the kernel tracks its own fanout
        # (explode + equi-join), >1 means a super-fanout term crept in
        ratios = {}
        for lo, hi in zip(keylens, keylens[1:]):
            w = (out["keylens"][str(hi)]["wall"]
                 / out["keylens"][str(lo)]["wall"])
            v = _n_variants(hi) / _n_variants(lo)
            ratios[f"{lo}->{hi}"] = {
                "wall_ratio": round(w, 3),
                "variant_ratio": round(v, 3),
                "wall_per_variant": round(w / v, 3)}
        out["len_ratios"] = ratios
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
