"""Unit tests for scalar functions and operator edges not exercised by
the oracle queries: UTF-8 scrub, GMT derivation, tag stripping, email
sanitize, generic melt, dedup keep=max, and split_trim literalness."""

from __future__ import annotations

from pyspark.sql import functions as F

from wp_etl_migration_spark.functions.dates import local_to_gmt
from wp_etl_migration_spark.functions.text import (
    esc_url_raw, kses_post, kses_post_str, sanitize_email, split_trim,
    strip_all_tags, utf8_scrub)
from wp_etl_migration_spark.operators.dedup import exact_dedup
from wp_etl_migration_spark.operators.melt import melt


def one(spark, value, col_fn, schema="s string"):
    df = spark.createDataFrame([(value,)], schema)
    return df.select(col_fn(F.col("s")).alias("out")).first()["out"]


def test_utf8_scrub(spark):
    assert one(spark, "ok\x00bad\x1fx�y", utf8_scrub) == "okbadxy"
    assert one(spark, "clean", utf8_scrub) == "clean"


def test_local_to_gmt(spark):
    df = spark.createDataFrame([("2024-06-01 12:00:00",)], "s string")
    out = df.select(
        F.date_format(local_to_gmt(F.to_timestamp("s"),
                                   "America/New_York"),
                      "yyyy-MM-dd HH:mm:ss").alias("gmt")).first()["gmt"]
    assert out == "2024-06-01 16:00:00"      # EDT is UTC-4


def test_strip_all_tags(spark):
    html = "<style>p{x}</style><p>Hello <b>world</b></p>\n <script>1</script>tail"
    assert one(spark, html, strip_all_tags) == "Hello world tail"


def test_sanitize_email(spark):
    assert one(spark, " a b@x.com ", sanitize_email) == "ab@x.com"
    assert one(spark, "not-an-email", sanitize_email) is None
    assert one(spark, "x@y.co", sanitize_email) == "x@y.co"


def test_split_trim_literal_delimiter(spark):
    # '.' must split literally, not as a regex wildcard.
    out = one(spark, "a . b.c", lambda c: F.array_join(
        split_trim(c, "."), "|"))
    assert out == "a|b|c"


def test_melt_generic(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], ["id", "a", "b"])
    rows = sorted(map(tuple, melt(df, ["id"], ["a", "b"]).collect()))
    assert rows == [(1, "a", "x"), (1, "b", "2.5")]


def test_exact_dedup_keep_max(spark):
    df = spark.createDataFrame(
        [(1, "same"), (5, "same"), (3, "other")], ["id", "text"])
    kept = sorted(r["id"] for r in
                  exact_dedup(df, "id", ["text"], keep="max").collect())
    assert kept == [3, 5]


def test_kses_post_allowlist():
    # Allowed tag kept, disallowed attr (event handler) dropped.
    assert kses_post_str('<p onclick="x" class="c">hi</p>') == \
        '<p class="c">hi</p>'
    # Disallowed tag loses markup, keeps inner text (wp_kses quirk).
    assert kses_post_str('<script>alert(1)</script>ok') == 'alert(1)ok'
    # javascript: URL attr dropped; safe URL kept.
    assert kses_post_str('<a href="javascript:x()">a</a>'
                         '<a href="https://e.com/">b</a>') == \
        '<a>a</a><a href="https://e.com/">b</a>'
    # Comments dropped; void elements self-close; entities verbatim.
    assert kses_post_str('x<!-- c --><br>&amp; y') == 'x<br />&amp; y'
    # Rawtext (CDATA) content cannot re-form markup: data-position '<'
    # escapes to &lt; (hypothesis-found regression).
    assert kses_post_str('<script><script></script>') == '&lt;script>'
    assert kses_post_str('a < b') == 'a &lt; b'
    assert kses_post_str(None) is None


def test_kses_post_scheme_whitespace_bypass():
    # Embedded tab/newline (literal or entity-encoded) in the scheme must
    # not defeat the allow-list: browsers strip ASCII tab/newline when
    # parsing URLs (wp_kses_bad_protocol strips [\x00-\x20] first).
    assert kses_post_str('<a href="jav\tascript:alert(1)">a</a>') == \
        '<a>a</a>'
    assert kses_post_str('<a href="jav&#x09;ascript:alert(1)">a</a>') == \
        '<a>a</a>'
    assert kses_post_str('<a href="java\nscript:x()">a</a>') == '<a>a</a>'
    assert kses_post_str('<a href=" javascript:x()">a</a>') == '<a>a</a>'
    assert kses_post_str('<img src="jav&#x0A;ascript:y()">') == '<img />'
    # Leading whitespace on a GOOD scheme still passes.
    assert kses_post_str('<a href=" https://e.com/">a</a>') == \
        '<a href=" https://e.com/">a</a>'


def test_kses_post_column(spark):
    out = one(spark, '<em onmouseover="h()">t</em><iframe src="x"/>',
              kses_post)
    assert out == '<em>t</em>'


def test_esc_url_raw(spark):
    assert one(spark, " https://e.com/a?b=1 ", esc_url_raw) == \
        "https://e.com/a?b=1"
    assert one(spark, "javascript:alert(1)", esc_url_raw) is None
    # Interior spaces percent-encode (WP semantics), not delete — deletion
    # would glue tokens together ('/rel/path 42' must NOT become
    # '/rel/path42').
    assert one(spark, "/rel/path x<>", esc_url_raw) == "/rel/path%20x"
    assert one(spark, "/rel/path 42", esc_url_raw) == "/rel/path%2042"
    assert one(spark, "MAILTO:a@b.co", esc_url_raw) == "MAILTO:a@b.co"
    assert one(spark, "   ", esc_url_raw) is None
