#!/usr/bin/env python
"""sf1 spot-bench for the TEXT-STATS family on a realistic vocabulary.

VERDICT r7 #2: the raw sf0.1 ``documents`` table has only 31 distinct
words, so the committed headline rows for the text ops (vocabulary
build, LM scoring, keywords, line dedup) measure a vocabulary three
orders of magnitude smaller than real crawl text. This rig re-measures
those operators on the shared diversified corpus
(``bench_corpus.diversified_corpus``): 32 replica-suffixed copies of
sf0.1 — **160,000 docs, ~1,000 distinct words** (31 × 32 + digits), the
same corpus the 1k-merge BPE study trains on. ``line_dedup`` runs on
the boilered variant (every 3rd source doc carries a corpus-global
boilerplate line, ``" | "``-delimited) so the frequency pass has real
cross-document duplicate structure to find.

What changes vs the raw table: token-key cardinality in the vocab /
LM / keyword shuffles grows 32×, the LM context space (~31² → ~10⁶
trigram contexts) stops fitting in a handful of hash buckets, and the
per-key frequency head flattens toward a realistic Zipf-ish shape.
What doesn't change: token COUNT (the explode volume) only grows with
the 32× doc multiplier, so these walls are not comparable to the sf0.1
headline rows — they are the honest vocabulary-scaling measurement the
headline rows cannot give.

Methodology (matches the other bench_sf1_* rigs): each timed op runs
in a FRESH interpreter + SparkSession (subprocess per op; in-session
repeats are invalid — JIT/caches), local[32], noop-sink writes.

Run:  python bench_sf1_text.py            # full study, one JSON line
      python bench_sf1_text.py --op NAME  # one op, this process
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPLICAS = 32
BOILER_EVERY = 3
_ROOT = os.path.dirname(os.path.abspath(__file__))


def _spark():
    from wp_etl_migration_spark.session import get_spark
    spark = get_spark("wp-etl-sf1-text",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_op(name: str) -> None:
    from pyspark.sql import functions as F

    from bench_corpus import diversified_corpus

    spark = _spark()
    boiler = name == "line_dedup"
    path = diversified_corpus(
        spark, replicas=REPLICAS,
        boiler_every=BOILER_EVERY if boiler else None)
    corpus = spark.read.parquet(path)

    if name == "vocab_build":
        from wp_etl_migration_spark.operators.textstats import vocab_build
        out = lambda: vocab_build(corpus, "text", top_k=1000)  # noqa: E731
    elif name == "trigram_lm":
        # Same train/score split as the q_trigram_lm_score headline
        # row: train on the 80% slice, score the held-out 20%.
        from wp_etl_migration_spark.operators.lm import (
            lm_score_ngram, ngram_counts)

        def out():
            lm = ngram_counts(corpus.where(F.col("doc_id") % 5 != 0),
                              "text", n=3)
            return lm_score_ngram(
                corpus.where(F.col("doc_id") % 5 == 0), lm,
                "doc_id", "text", n=3)
    elif name == "trigram_lm_pruned":
        # VERDICT r8 #4: same split, but the LM build prunes
        # singleton (ctx, w) grams BEFORE the context-totals shuffle
        # and the counts⋈totals join (min_count=2, prune='pre_total')
        # — on this Zipf-ish corpus the singleton tail is most of the
        # ~1e6 distinct keys, so the second shuffle and the join
        # shrink accordingly. Before/after pair for BASELINE.md §r9.
        from wp_etl_migration_spark.operators.lm import (
            lm_score_ngram, ngram_counts)

        def out():
            lm = ngram_counts(corpus.where(F.col("doc_id") % 5 != 0),
                              "text", n=3, min_count=2,
                              prune="pre_total")
            return lm_score_ngram(
                corpus.where(F.col("doc_id") % 5 == 0), lm,
                "doc_id", "text", n=3)
    elif name in ("trigram_lm_singletons", "trigram_lm_singletons_pruned"):
        # The corpus shape pre_total pruning exists for: real crawl
        # text carries an enormous n-gram singleton tail (roughly half
        # of distinct n-grams appear once), which the replica-suffixed
        # fixture lacks (869k -> 861k grams at min_count=2). Derived
        # deterministically here: every odd source doc gets its words
        # additionally ~d<doc_id>-suffixed, making its trigrams
        # doc-unique — the distinct-key space inflates with singleton
        # grams that pre_total drops BEFORE the totals shuffle and
        # join. Corpus prep is pinned untimed; only the build+score is
        # measured.
        from wp_etl_migration_spark.operators.lm import (
            lm_score_ngram, ngram_counts)
        corpus = corpus.withColumn(
            "text",
            F.when(F.col("doc_id") % 2 == 1,
                   F.regexp_replace(
                       F.col("text"), r"(\S+)",
                       F.concat(F.lit("$1~d"),
                                F.col("doc_id").cast("string"))))
            .otherwise(F.col("text"))).localCheckpoint(eager=True)
        pruned = name.endswith("_pruned")

        def out():
            kw = ({"min_count": 2, "prune": "pre_total"}
                  if pruned else {})
            lm = ngram_counts(corpus.where(F.col("doc_id") % 5 != 0),
                              "text", n=3, **kw)
            return lm_score_ngram(
                corpus.where(F.col("doc_id") % 5 == 0), lm,
                "doc_id", "text", n=3)
    elif name == "keywords":
        from wp_etl_migration_spark.operators.textstats import (
            extract_keywords)
        out = lambda: extract_keywords(  # noqa: E731
            corpus, "doc_id", "text", top_k=5)
    elif name == "line_dedup":
        from wp_etl_migration_spark.operators.dedup import line_dedup
        out = lambda: line_dedup(corpus, "doc_id", "text",  # noqa: E731
                                 max_line_df=3, delimiter=" | ")
    else:
        raise SystemExit(f"unknown op {name!r}")

    start = time.monotonic()
    out().write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - start, 3)
    print(json.dumps({"op": name, "wall_s": wall}))
    spark.stop()


OPS = ("vocab_build", "trigram_lm", "trigram_lm_pruned",
       "trigram_lm_singletons", "trigram_lm_singletons_pruned",
       "keywords", "line_dedup")


def main() -> int:
    if "--op" in sys.argv:
        run_op(sys.argv[sys.argv.index("--op") + 1])
        return 0
    timings: dict[str, float] = {}
    failed: list[str] = []
    for op in OPS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--op", op],
            capture_output=True, text=True, cwd=_ROOT)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            failed.append(op)
            print(f"op={op} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr, flush=True)
            continue
        timings[op] = json.loads(line[-1])["wall_s"]
        print(line[-1], flush=True)
    print(json.dumps({
        "metric": "sf1_text_diversified", "unit": "sec",
        "docs": 5000 * REPLICAS, "replicas": REPLICAS,
        "queries": timings}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
