"""WP-entity source builders (S6–S8): filters, embeds, parent slug —
over FIXTURES.md-shaped in-memory tables."""

from __future__ import annotations

import pytest

from wp_etl_migration_spark.sources.wordpress import (
    WPPostsSource, WPTermsSource, WPUsersSource)


@pytest.fixture()
def wp(spark):
    posts = spark.createDataFrame(
        [(1, 10, "hello", "post", "publish"),
         (2, 10, "draft-x", "post", "draft"),
         (3, 11, "about", "page", "publish"),
         (4, 11, "img", "attachment", "publish")],
        ["ID", "post_author", "post_name", "post_type", "post_status"])
    meta = spark.createDataFrame(
        [(1, 1, "subtitle", "s1"), (2, 1, "score", "9"),
         (3, 1, "score", "7"), (4, 3, "subtitle", "s3")],
        ["meta_id", "post_id", "meta_key", "meta_value"])
    terms = spark.createDataFrame(
        [(100, "news", "news", "category", 0),
         (101, "Tech", "tech", "category", 100),
         (102, "blue", "blue", "post_tag", 0)],
        ["term_id", "name", "slug", "taxonomy", "parent"])
    rels = spark.createDataFrame(
        [(1, 100), (1, 101), (1, 102), (3, 100)],
        ["post_id", "term_id"])
    users = spark.createDataFrame(
        [(10, "alice", "a@x.com", "Alice", "editor"),
         (11, "bob", "b@x.com", "Bob", "author"),
         (12, "eve", "e@y.org", "Eve", "subscriber")],
        ["ID", "user_login", "user_email", "display_name", "role"])
    return dict(posts=posts, meta=meta, terms=terms, rels=rels,
                users=users)


def test_posts_filters_and_embeds(wp):
    df = (WPPostsSource(wp["posts"], meta=wp["meta"],
                        terms=wp["terms"], relationships=wp["rels"],
                        users=wp["users"])
          .with_post_type("post", "page")
          .with_post_status("publish")
          .with_meta().with_taxonomies().with_author()
          .load())
    rows = {r["ID"]: r for r in df.collect()}
    assert set(rows) == {1, 3}
    # meta: key → list of values (multi-valued 'score' preserved).
    assert rows[1]["meta"]["score"] == ["7", "9"]
    assert rows[1]["meta"]["subtitle"] == ["s1"]
    # taxonomies: map taxonomy → term structs.
    tax = rows[1]["taxonomies"]
    assert [t["slug"] for t in tax["category"]] == ["news", "tech"]
    assert [t["slug"] for t in tax["post_tag"]] == ["blue"]
    # author struct.
    assert rows[1]["author"]["login"] == "alice"
    assert rows[3]["author"]["display_name"] == "Bob"
    # left embeds: page 3 has no tags → taxonomy map lacks post_tag.
    assert "post_tag" not in (rows[3]["taxonomies"] or {})


def test_posts_order_limit(wp):
    df = (WPPostsSource(wp["posts"])
          .with_order_by("post_name", desc=True).with_limit(2).load())
    assert [r["post_name"] for r in df.collect()] == ["img", "hello"]


def test_terms_hide_empty_and_parent_slug(wp):
    df = (WPTermsSource(wp["terms"], relationships=wp["rels"])
          .with_taxonomy("category")
          .with_hide_empty().with_parent_slug()
          .load())
    rows = {r["slug"]: r for r in df.collect()}
    assert set(rows) == {"news", "tech"}       # 'blue' filtered by taxonomy
    assert rows["tech"]["parent_slug"] == "news"
    assert rows["news"]["parent_slug"] is None


def test_users_filters(wp):
    src = WPUsersSource(wp["users"]).with_role_not_in("subscriber")
    assert sorted(r["ID"] for r in src.load().collect()) == [10, 11]
    found = (WPUsersSource(wp["users"]).with_search("@y.org")
             .load().collect())
    assert [r["ID"] for r in found] == [12]
    inc = (WPUsersSource(wp["users"]).with_include([10, 12])
           .with_exclude([12]).load().collect())
    assert [r["ID"] for r in inc] == [10]
