#!/usr/bin/env python
"""sf1 spot-bench for SKEWED-corpus behavior — the scale companion to
``tests/test_skewed_corpus.py`` (which proves bounded task skew at
test size): a 500k-doc corpus with real pathologies — one document
mirrored 50,000×, one boilerplate line in ~30% of docs, one domain
owning half the corpus — through the skew-sensitive operators,
measuring wall time AND comparing the r6 two-phase ``cap_per_key``
against the pre-r6 single-window shape on identical data.

Corpus: 100 deterministic replicas of the sf0.1 documents table
(5,000 docs each); replica r's docs are made unique by interleaving a
per-replica token, then the hot structures are injected. Scratch
parquet lives under .scratch/ (gitignored).

Methodology: one cold session per timed operator (same rationale as
the other bench_sf1_* rigs — in-session repeats are invalid and
single runs vary; here we care about SHAPE differences ≫ noise, and
the single-vs-two-phase comparison runs in ONE session back-to-back
on the same cached input, alternating order across --study rounds).

Run:  python bench_sf1_skew.py            # the full study (3 rounds)
      python bench_sf1_skew.py --op NAME  # one op, this process
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

REPLICAS = 100
MIRRORS = 50_000
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".scratch", "sf1_skew.parquet")
BOILER = "subscribe to our newsletter for daily updates and offers"
HOT_TEXT = ("mirror mirror of the same press release body repeated "
            "verbatim across every syndication partner site today")


def build_corpus(spark) -> None:
    if os.path.exists(os.path.join(SCRATCH, "_SUCCESS")):
        return
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet")) \
        .select("doc_id", "text")
    n = docs.count()
    reps = spark.range(REPLICAS).withColumnRenamed("id", "rep")
    uniq = (docs.crossJoin(F.broadcast(reps))
            .select((F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
                    F.concat(
                        F.when(F.col("doc_id") % 3 == 0,
                               F.lit(BOILER + " | ")).otherwise(F.lit("")),
                        F.regexp_replace(
                            F.col("text"), " ",
                            F.concat(F.lit(" w"),
                                     F.col("rep").cast("string"),
                                     F.lit(" ")))).alias("text"),
                    F.when(F.col("doc_id") % 2 == 0, "hot.example")
                    .otherwise(F.concat(F.lit("site"),
                                        (F.col("doc_id") % 40)
                                        .cast("string"),
                                        F.lit(".example")))
                    .alias("source")))
    base = n * REPLICAS
    mirrors = spark.range(MIRRORS).select(
        (F.col("id") + base).alias("doc_id"),
        F.lit(HOT_TEXT).alias("text"),
        F.lit("hot.example").alias("source"))
    uniq.unionByName(mirrors).write.mode("overwrite").parquet(SCRATCH)


def _spark():
    from wp_etl_migration_spark.session import get_spark
    spark = get_spark("wp-etl-sf1-skew",
                      **{"spark.driver.memory":
                         os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                                        "48g")})
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _single_window_cap(df, id_col, key_col, max_per_key, salt):
    """The pre-r6 cap_per_key shape (ONE window partitioned by key —
    the hot domain lands on one task), kept here as the comparison
    arm; semantics identical to operators/sampling.cap_per_key."""
    draw = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(draw.asc(),
                                            F.col(id_col).asc())
    return (df.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= max_per_key).drop("__rk"))


def _window_gram_docfreq(df, id_col, text_col, k, max_doc_freq):
    """The r14 shared_gram_stats shape (doc frequency as COUNT OVER
    (PARTITION BY gram) — no partial aggregation, no AQE skew split:
    every row of a hot gram lands in ONE window task), kept here as
    the comparison arm for the r15 de-skew (VERDICT r14 item 1)."""
    from wp_etl_migration_spark.operators.textstats import (
        shingles_with_count)
    sh = shingles_with_count(df, id_col, text_col, k)
    counted = (sh.select(F.col(id_col),
                         F.xxhash64("shingle").alias("__g"))
               .groupBy(id_col, "__g").agg(F.count("*").alias("__c")))
    counted = counted.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("__g")))
    shared_cond = (F.col("__df") >= 2) & (F.col("__df") <= max_doc_freq)
    return (counted.groupBy(id_col)
            .agg(F.sum("__c").alias("n_grams"),
                 F.sum(F.when(shared_cond, F.col("__c"))
                       .otherwise(0)).alias("n_dup_grams")))


def _window_keywords(df, id_col, text_col, top_k, n_docs):
    """The r14 extract_keywords shape (doc frequency as COUNT OVER
    (PARTITION BY token)) — comparison arm for the r15 de-skew."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tf = (df.select(F.col(id_col), F.explode(toks).alias("token"))
          .groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    tf = (tf.withColumn("df", F.count(F.lit(1)).over(
              Window.partitionBy("token")))
          .where(F.col("df") <= int(0.5 * n_docs)))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("token"))
    return (tf.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= top_k))


def run_op(name: str) -> dict:
    spark = _spark()
    build_corpus(spark)
    corpus = spark.read.parquet(SCRATCH)
    out: dict = {"op": name}
    if name == "line_dedup":
        from wp_etl_migration_spark.operators.dedup import line_dedup
        t0 = time.monotonic()
        res = line_dedup(corpus, "doc_id", "text", max_line_df=3,
                         delimiter=" | ")
        res.write.format("noop").mode("overwrite").save()
        out["sec"] = round(time.monotonic() - t0, 3)
    elif name == "vocab_build":
        from wp_etl_migration_spark.operators.textstats import vocab_build
        t0 = time.monotonic()
        vocab_build(corpus, "text", top_k=1000) \
            .write.format("noop").mode("overwrite").save()
        out["sec"] = round(time.monotonic() - t0, 3)
    elif name == "upsert_hot_slug":
        # The wp_post_all journey's id path under a 50k× duplicated
        # slug: every mirrored doc maps to ONE (post_name, post_type),
        # so probe-before-insert must mint exactly one id for the hot
        # entity while assign_new_ids range-partitions 500k unique
        # slugs around it.  Production config (broadcasts on, AQE
        # defaults) — the test-scale no-broadcast bound lives in
        # tests/test_skewed_corpus.py.
        from wp_etl_migration_spark.sinks.wordpress import (
            post_upsert_stage)
        incoming = corpus.select(
            F.lit(None).cast("long").alias("post.ID"),
            F.when(F.col("text") == HOT_TEXT, "hot-press-release")
             .otherwise(F.concat(F.lit("slug-"),
                                 F.col("doc_id").cast("string")))
             .alias("post.post_name"),
            F.lit("post").alias("post.post_type"),
            F.substring("text", 1, 40).alias("post.post_title"),
        ).localCheckpoint(eager=True)
        posts = spark.range(1, 10_001).select(
            F.col("id").alias("ID"),
            F.concat(F.lit("existing-"), F.col("id").cast("string"))
             .alias("post_name"),
            F.lit("post").alias("post_type"),
            F.lit("old").alias("post_title")).localCheckpoint(eager=True)
        t0 = time.monotonic()
        st = post_upsert_stage()({"incoming": incoming, "posts": posts})
        st["incoming"].write.format("noop").mode("overwrite").save()
        n_posts = st["posts"].count()
        out["sec"] = round(time.monotonic() - t0, 3)
        n_in = incoming.count()
        out["rows_in"] = n_in
        out["posts_out"] = n_posts
        # one minted entity for the hot slug, one per unique slug
        assert n_posts == 10_000 + (n_in - MIRRORS) + 1, n_posts
    elif name == "training_shards_hot":
        # The training_prep_all journey's write under the hot corpus:
        # md5(id)-addressed shard membership scatters the 50k mirrors
        # uniformly — shard balance is asserted, not hoped for.
        import shutil
        from wp_etl_migration_spark.sinks.training import (
            write_training_shards)
        dest = os.path.join(os.path.dirname(SCRATCH),
                            "sf1_skew_shards")
        shutil.rmtree(dest, ignore_errors=True)
        n_shards = 32
        t0 = time.monotonic()
        manifest = write_training_shards(corpus, dest, "doc_id",
                                         n_shards=n_shards,
                                         salt="skewbed|")
        out["sec"] = round(time.monotonic() - t0, 3)
        per = [v["rows"] for v in manifest["shards"].values()]
        fair = manifest["n_rows"] / n_shards
        out["shard_rows_max_over_fair"] = round(max(per) / fair, 3)
        out["shard_rows_min_over_fair"] = round(min(per) / fair, 3)
        assert max(per) <= 1.2 * fair and min(per) >= 0.8 * fair, per
        shutil.rmtree(dest, ignore_errors=True)
    elif name in ("gram_docfreq_join", "gram_docfreq_window"):
        # r15 de-skew evidence (VERDICT r14 item 1): doc frequency of
        # a hot gram — the BOILER phrase rides in ~1/3 of all docs and
        # the 50k mirrors share every gram — via the r15 join shape
        # (operator) vs the r14 window shape (inline arm above).
        t0 = time.monotonic()
        if name == "gram_docfreq_join":
            from wp_etl_migration_spark.operators.textstats import (
                shared_gram_stats)
            res = shared_gram_stats(corpus, "doc_id", "text", k=8,
                                    max_doc_freq=100_000)
        else:
            res = _window_gram_docfreq(corpus, "doc_id", "text", 8,
                                       100_000)
        res.write.format("noop").mode("overwrite").save()
        out["sec"] = round(time.monotonic() - t0, 3)
    elif name in ("keywords_join", "keywords_window"):
        n_docs = corpus.count()
        t0 = time.monotonic()
        if name == "keywords_join":
            from wp_etl_migration_spark.operators.textstats import (
                extract_keywords)
            res = extract_keywords(corpus, "doc_id", "text", top_k=5)
        else:
            res = _window_keywords(corpus, "doc_id", "text", 5, n_docs)
        res.write.format("noop").mode("overwrite").save()
        out["sec"] = round(time.monotonic() - t0, 3)
    elif name in ("cap_two_phase", "cap_single_window"):
        from wp_etl_migration_spark.operators.sampling import cap_per_key
        thin = corpus.select("doc_id", "source") \
            .localCheckpoint(eager=True)      # same materialized input
        t0 = time.monotonic()
        if name == "cap_two_phase":
            res = cap_per_key(thin, "doc_id", "source",
                              max_per_key=100, salt="cap|")
        else:
            res = _single_window_cap(thin, "doc_id", "source",
                                     100, "cap|")
        res.write.format("noop").mode("overwrite").save()
        out["sec"] = round(time.monotonic() - t0, 3)
    else:
        raise SystemExit(f"unknown op {name}")
    return out


OPS = ("line_dedup", "vocab_build", "cap_two_phase",
       "cap_single_window", "gram_docfreq_join", "gram_docfreq_window",
       "keywords_join", "keywords_window")
JOURNEY_OPS = ("upsert_hot_slug", "training_shards_hot")


def journeys() -> int:
    """2 alternating-order cold-session rounds of the composed-journey
    shapes on the skewed corpus (VERDICT r6 #5)."""
    timings: dict[str, list[dict]] = {o: [] for o in JOURNEY_OPS}
    for r in range(2):
        order = JOURNEY_OPS if r % 2 == 0 else tuple(
            reversed(JOURNEY_OPS))
        for op in order:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--op", op],
                capture_output=True, text=True, env=dict(os.environ))
            if proc.returncode != 0:
                print(json.dumps({"error": proc.stderr[-500:]}))
                return 1
            timings[op].append(
                json.loads(proc.stdout.strip().splitlines()[-1]))
    print(json.dumps({
        "metric": "sf1_skewed_journeys", "unit": "sec",
        "docs": 5000 * REPLICAS + MIRRORS, "mirrors": MIRRORS,
        "runs": {o: [t["sec"] for t in ts]
                 for o, ts in timings.items()},
        "min": {o: min(t["sec"] for t in ts)
                for o, ts in timings.items()},
        "detail": {o: ts[0] for o, ts in timings.items()},
    }))
    return 0


def study() -> int:
    timings: dict[str, list[float]] = {o: [] for o in OPS}
    for r in range(3):
        order = OPS if r % 2 == 0 else tuple(reversed(OPS))
        for op in order:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--op", op],
                capture_output=True, text=True, env=dict(os.environ))
            if proc.returncode != 0:
                print(json.dumps({"error": proc.stderr[-500:]}))
                return 1
            timings[op].append(
                json.loads(proc.stdout.strip().splitlines()[-1])["sec"])
    print(json.dumps({
        "metric": "sf1_skewed_corpus", "unit": "sec",
        "docs": 5000 * REPLICAS + MIRRORS, "mirrors": MIRRORS,
        "runs": timings,
        "min": {o: min(t) for o, t in timings.items()},
        "median": {o: sorted(t)[1] for o, t in timings.items()},
        "cap_single_vs_two_phase":
            round(min(timings["cap_single_window"])
                  / min(timings["cap_two_phase"]), 2),
    }))
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--op" in args:
        print(json.dumps(run_op(args[args.index("--op") + 1])))
        sys.exit(0)
    if "--journeys" in args:
        sys.exit(journeys())
    sys.exit(study())
