"""Canned per-entity pipeline presets (plans/presets.py ≙ the
reference's TransformationPipelines/*.php field chains): the FIXTURES.md
legacy schema through each preset, asserting the worked example's
golden output."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wp_etl_migration_spark.plans.presets import (
    WordPressMediaPipeline, WordPressPostPipeline, wordpress_media_pipeline,
    wordpress_post_pipeline, wordpress_term_pipeline,
    wordpress_user_pipeline)

NOW_PY = dt.datetime(2025, 6, 1, 12, 0, 0)


def _now():
    return F.lit("2025-06-01 12:00:00").cast("timestamp")


def _legacy_posts(spark):
    """The FIXTURES.md / examples legacy flat rows mapped to prefixed
    post columns (the transform() step of the worked example)."""
    return spark.createDataFrame(
        [(101, 'Hello <b onclick="x()">World</b>', None, "Published",
          "<p>First!</p>", "2024-01-05 10:00:00"),
         (102, "  Second   Post  ", "custom-slug!", "draft",
          None, None),
         (103, "", None, "bogus-status", "", "2024-03-01 00:00:00")],
        "`meta.legacy_id` long, `post.post_title` string, "
        "`post.post_name` string, `post.post_status` string, "
        "`post.post_content` string, `post.post_date` string") \
        .withColumn("post.post_date",
                    F.col("`post.post_date`").cast("timestamp"))


def test_post_preset_golden(spark):
    out = wordpress_post_pipeline(now=_now(), tz="America/New_York")(
        _legacy_posts(spark))
    rows = {r["meta.legacy_id"]: r for r in out.collect()}

    r = rows[101]
    assert r["post.post_type"] == "post"
    assert r["post.post_title"] == "Hello World"    # tags stripped
    assert r["post.post_name"] == "hello-world"     # slug from title
    assert r["post.post_status"] == "publish"       # status mapped
    assert r["post.post_content"] == "<p>First!</p>"
    assert r["post.post_author"] == 1
    assert r["post.post_excerpt"] == ""
    assert r["post.post_date"] == dt.datetime(2024, 1, 5, 10, 0)
    # GMT chain: NY winter = UTC-5
    assert r["post.post_date_gmt"] == dt.datetime(2024, 1, 5, 15, 0)
    assert r["post.post_modified_date"] == r["post.post_date"]
    assert r["meta.etl_pipeline"] == "WordPressPostPipeline"

    r = rows[102]
    assert r["post.post_title"] == "Second Post"    # ws collapsed
    assert r["post.post_name"] == "custom-slug"     # provided, normalized
    assert r["post.post_status"] == "draft"
    assert r["post.post_content"] == "Default post content"
    assert r["post.post_date"] == NOW_PY            # now() default

    r = rows[103]
    assert r["post.post_title"] == "Default post title"   # '' -> default
    assert r["post.post_name"] == "default-post-title"    # slug of title
    assert r["post.post_status"] == "draft"               # unknown -> default
    assert r["post.post_content"] == "Default post content"  # '' -> default


def test_post_preset_defaults_override_and_registry(spark):
    from wp_etl_migration_spark.plans.runner import _PIPELINES
    assert _PIPELINES["wordpress_post"] is WordPressPostPipeline
    out = wordpress_post_pipeline(
        now=_now(), post_type="page",
        defaults={"post_status": "pending", "post_author": 7})(
        _legacy_posts(spark))
    r = {x["meta.legacy_id"]: x for x in out.collect()}[103]
    assert r["post.post_type"] == "page"
    assert r["post.post_status"] == "pending"
    assert r["post.post_author"] == 7


def test_post_preset_is_pure_codegen(spark):
    """The whole chain must stay expression-only: no shuffle, no
    BatchEvalPython, single scan."""
    plan = wordpress_post_pipeline(now=_now())(_legacy_posts(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_term_preset_golden(spark):
    df = spark.createDataFrame(
        [("News & Culture", None, None),
         (" Tech ", "existing-slug", 5)],
        "`term.name` string, `term.slug` string, `term.parent` long")
    rows = wordpress_term_pipeline(taxonomy="topic")(df).collect()
    a, b = sorted(rows, key=lambda r: r["term.name"])
    assert a["term.name"] == "News & Culture"
    assert a["term.taxonomy"] == "topic"
    assert a["term.slug"] == "news-culture"
    assert a["term.parent"] == 0
    assert a["term.description"] == "" and a["term.alias_of"] == ""
    assert b["term.name"] == "Tech"
    assert b["term.slug"] == "existing-slug"
    assert b["term.parent"] == 5
    assert b["meta.etl_pipeline"] == "WordPressTermPipeline"


def test_user_preset_golden(spark):
    df = spark.createDataFrame(
        [("alice", "A@ex. com", "Alice Q", None),
         ("bob", "not-an-email", None, dt.datetime(2020, 1, 1))],
        "`user.user_login` string, `user.user_email` string, "
        "`user.display_name` string, `user.user_registered` timestamp")
    rows = {r["user.user_login"]: r
            for r in wordpress_user_pipeline(now=_now())(df).collect()}
    a = rows["alice"]
    assert a["user.user_email"] == "A@ex.com"       # sanitized
    assert a["user.display_name"] == "Alice Q"
    assert a["user.first_name"] == "" and a["user.last_name"] == ""
    assert a["user.user_registered"] == NOW_PY      # now() default
    assert a["user.role"] == "subscriber"
    b = rows["bob"]
    assert b["user.user_email"] == ""               # invalid -> ''
    assert b["user.display_name"] == "bob"          # falls back to login
    assert b["user.user_registered"] == dt.datetime(2020, 1, 1)
    assert b["meta.etl_pipeline"] == "WordPressUserPipeline"
    # reference-literal 'wp.' prefix is one argument away
    wp = wordpress_user_pipeline(core_prefix="wp")(
        df.withColumnsRenamed({c: c.replace("user.", "wp.")
                               for c in df.columns}))
    assert "wp.role" in wp.columns


def test_media_preset_extends_post_chain(spark):
    df = spark.createDataFrame([("IMG 1", "https://ex.com/a.jpg")],
                               "`post.post_title` string, `src` string")
    out = wordpress_media_pipeline(now=_now())(
        df.withColumn("media.remote_url", F.array("src")))
    r = out.first()
    assert r["post.post_type"] == "attachment"
    assert r["post.post_name"] == "img-1"
    assert r["media.remote_url"] == ["https://ex.com/a.jpg"]
    assert r["post.local_path"] == ""
    assert r["meta.etl_pipeline"] == "WordPressMediaPipeline"
    # absent remote_url column is created as null array<string>
    out2 = wordpress_media_pipeline(now=_now())(df.drop("src"))
    assert dict(out2.dtypes)["media.remote_url"] == "array<string>"


def test_preset_subclass_overrides_field_method(spark):
    """Template-method parity: a migration overrides exactly the field
    steps its source maps (≙ subclassing WordPressPostPipeline.php)."""
    class MyPosts(WordPressPostPipeline):
        post_type = "story"

        def post_meta(self, df):
            return df.withColumn(self.meta("source"), F.lit("legacy"))

    out = MyPosts(now=_now())(_legacy_posts(spark))
    r = out.first()
    assert r["post.post_type"] == "story"
    assert r["meta.source"] == "legacy"
    assert r["meta.etl_pipeline"] == "MyPosts"


def test_prefixed_pipeline_subclass_without_class_defaults(spark):
    """A _PrefixedPipeline subclass that declares no class-level
    defaults dict still accepts the defaults= kwarg (ADVICE r5: the
    base class now declares defaults = {} so the merge has a target
    instead of raising AttributeError)."""
    from wp_etl_migration_spark.plans.presets import _PrefixedPipeline

    class Bare(_PrefixedPipeline):
        pass

    p = Bare(defaults={"post.post_status": "draft"})
    assert p.defaults == {"post.post_status": "draft"}
    # instance merge must not mutate the shared class attribute
    assert _PrefixedPipeline.defaults == {}
    assert Bare().defaults == {}
