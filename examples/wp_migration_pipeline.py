#!/usr/bin/env python
"""End-to-end WordPress-style content migration — the reference's
canonical job (≙ lib/Commands/ProcessCommand.php + the WP_Post_All
loader fan-out, Load Orchestrator.php:125-135) composed from this
engine's stages:

    legacy CSV ─ prefix/sanitize/slugify/kses/date transforms
               ─ snapshot target tables (≙ the pre-migration db export)
               ─ staged loader chain: users → posts → postmeta → terms
                 (each stage mutates the stream with generated IDs)
               ─ ledger lineage write
               ─ janitor ledger rollback demo (restores pre-run posts)

Run:  PYTHONPATH=. python examples/wp_migration_pipeline.py [out_dir]

Everything between the scans and the sinks is ONE lazy Spark plan per
stage barrier; the stage chain is the explicit-dataflow translation of
the reference's SynchronousPipelineLoader row mutation.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from wp_etl_migration_spark.functions.dates import (
    normalize_datetime, validate_date)
from wp_etl_migration_spark.functions.text import kses_post
from wp_etl_migration_spark.plans import janitor
from wp_etl_migration_spark.plans.presets import (
    wordpress_post_pipeline, wordpress_user_pipeline)
from wp_etl_migration_spark.session import get_spark, tune
from wp_etl_migration_spark.sinks import ledger as lsink
from wp_etl_migration_spark.sinks.wordpress import (
    meta_stage, post_upsert_stage, run_stages, terms_stage,
    user_upsert_stage)

LEGACY_CSV = """id,title,body,author_email,author_login,category,tags,published
101,Hello World,"<p class=""lead"" onclick=""x()"">First!</p><script>evil()</script>",a@ex.com,alice,news,"intro,first",2024-01-05 10:00:00
102,Second Post,"<em>fine</em> text",b@ex.com,bob,tech,"deep",2024-02-10T12:30:00
103,Third,"plain body",a@ex.com,alice,news,"intro",not a date
"""


def transform(raw):
    """Legacy columns → prefixed WP entities (post./user./meta./tax.),
    then the canned presets (plans/presets.py ≙ the reference's
    WordPressPostPipeline/WordPressUserPipeline) fill the standard
    chains: post_type, slug-from-title, status default, excerpt,
    date/GMT, the etl_pipeline meta stamp, user role/display_name."""
    published = validate_date(
        F.col("published"),
        fallback=F.lit("2000-01-01 00:00:00").cast("timestamp"))
    mapped = raw.select(
        F.lit(None).cast("long").alias("post.ID"),
        F.col("title").alias("post.post_title"),
        kses_post(F.col("body")).alias("post.post_content"),
        published.alias("post.post_date"),
        F.col("author_email").alias("user.user_email"),
        F.col("author_login").alias("user.user_login"),
        F.col("id").cast("string").alias("meta.legacy_id"),
        F.split("tags", ",").alias("tax.post_tag"),
        F.col("category").alias("tax.category"),
    )
    entities = wordpress_user_pipeline()(wordpress_post_pipeline()(mapped))
    # the demo posts table stores ATOM strings, not timestamps
    return entities.withColumn(
        "post.post_date", normalize_datetime(F.col("`post.post_date`")))


def main(argv: list[str]) -> int:
    out = argv[0] if argv else "/tmp/wp_migration"
    spark = tune(get_spark("wp-migration-example"))
    spark.sparkContext.setLogLevel("ERROR")

    # --- extract ---------------------------------------------------
    src = f"{out}/legacy.csv"
    os.makedirs(out, exist_ok=True)
    open(src, "w").write(LEGACY_CSV)
    raw = (spark.read.option("header", True).option("quote", '"')
           .option("escape", '"').csv(src))

    # --- existing WP tables (targets) ------------------------------
    posts = spark.createDataFrame(
        [(1, "hello-world", "post", "Old Hello", "old", "2023-01-01")],
        ["ID", "post_name", "post_type", "post_title", "post_content",
         "post_date"])
    users = spark.createDataFrame(
        [(1, "a@ex.com", "alice", None, None)],
        "ID long, user_email string, user_login string, "
        "user_url string, description string")
    postmeta = spark.createDataFrame([], "post_id long, meta_key string,"
                                     " meta_value string")
    rels = spark.createDataFrame([], "post_id long, taxonomy string,"
                                 " term string")
    posts_path = f"{out}/posts"
    posts.write.mode("overwrite").parquet(posts_path)

    # --- snapshot before the destructive run (≙ wp db export) ------
    snap = janitor.snapshot_dataset(posts_path, tag="pre-migration")

    # --- transform + staged load -----------------------------------
    incoming = transform(raw)
    state = run_stages(
        {"incoming": incoming, "posts": spark.read.parquet(posts_path),
         "users": users, "postmeta": postmeta,
         "term_relationships": rels},
        [user_upsert_stage(), post_upsert_stage(), meta_stage(),
         terms_stage()])

    # --- ledger lineage (what did this run touch?) -----------------
    stream = lsink.with_uid(
        state["incoming"]
        .withColumn("ledger.post_id", F.col("`post.ID`"))
        .withColumn("ledger.slug", F.col("`post.post_name`")))
    lsink.write_ledger(stream, f"{out}/ledger", "migrate-posts")

    state["posts"].write.mode("overwrite").parquet(posts_path)
    n_posts = spark.read.parquet(posts_path).count()
    n_users = state["users"].count()
    n_meta = state["postmeta"].count()
    n_rels = state["term_relationships"].count()
    print(f"migrated: posts={n_posts} users={n_users} "
          f"meta={n_meta} term-links={n_rels}")

    # --- rollback demo: ledger-targeted delete, then snapshot restore
    survivors = janitor.delete_by_ledger(
        spark, spark.read.parquet(posts_path), "ID",
        f"{out}/ledger", "migrate-posts", ledger_key="post_id")
    print("after ledger rollback:", survivors.count(), "posts")
    janitor.restore_dataset(posts_path, snap)
    print("after snapshot restore:",
          spark.read.parquet(posts_path).count(), "posts (pre-run)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
