"""Tests for HTML→Gutenberg block conversion (F20/F21) and the cached
RSS source with pagination (S4/S5) — the latter driven through file://
URLs so no network is involved."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from wp_etl_migration_spark.functions.html import (
    block_pattern_lookup, html_to_blocks, html_to_blocks_str)
from wp_etl_migration_spark.sources.rss import (
    fetch_cached, from_rss, from_rss_pages)


# ------------------------------------------------------------------ blocks

def test_blocks_known_tags():
    out = html_to_blocks_str(
        "<p>Hello <b>world</b></p><h3>Head</h3><hr>"
        "<ul><li>a</li><li>b</li></ul>")
    parts = out.split("\n\n")
    assert parts[0] == ("<!-- wp:paragraph --><p>Hello <b>world</b></p>"
                        "<!-- /wp:paragraph -->")
    assert parts[1] == ('<!-- wp:heading {"level":3} --><h3>Head</h3>'
                        "<!-- /wp:heading -->")
    assert parts[2].startswith("<!-- wp:separator -->")
    assert parts[3] == ("<!-- wp:list --><ul><li>a</li><li>b</li></ul>"
                        "<!-- /wp:list -->")


def test_blocks_img_fallback_and_text():
    out = html_to_blocks_str(
        '<img src="x.png" alt="pic"><table><tr><td>t</td></tr></table>'
        "loose text")
    parts = out.split("\n\n")
    assert 'src="x.png"' in parts[0] and parts[0].startswith(
        "<!-- wp:image -->")
    assert parts[1].startswith("<!-- wp:freeform -->")
    assert "<table>" in parts[1]
    assert parts[2] == ("<!-- wp:paragraph --><p>loose text</p>"
                        "<!-- /wp:paragraph -->")


def test_blocks_udf_and_patterns(spark):
    df = spark.createDataFrame([("<p>x</p>", "cta"), (None, "nope")],
                               ["html", "pat"])
    out = df.select(
        html_to_blocks("html").alias("blocks"),
        block_pattern_lookup("pat", {"cta": "<!-- cta content -->"})
        .alias("pattern")).collect()
    assert out[0]["blocks"] == ("<!-- wp:paragraph --><p>x</p>"
                                "<!-- /wp:paragraph -->")
    assert out[0]["pattern"] == "<!-- cta content -->"
    assert out[1]["blocks"] is None and out[1]["pattern"] is None


# --------------------------------------------------------------------- rss

RSS_TPL = """<?xml version="1.0"?>
<rss><channel>
  <item><guid>{page}-1</guid><title>t{page}1</title></item>
  <item><guid>{page}-2</guid><title>t{page}2</title></item>
</channel></rss>
"""


def test_fetch_cached_file_url(tmp_path):
    src = tmp_path / "feed.xml"
    src.write_text(RSS_TPL.format(page=9))
    url = src.as_uri()
    cache = tmp_path / "cache"
    p1 = fetch_cached(url, str(cache))
    src.write_text("changed")          # cache must win on refetch
    p2 = fetch_cached(url, str(cache))
    assert p1 == p2
    assert "t91" in pathlib.Path(p1).read_text()


def test_from_rss_single(spark, tmp_path):
    src = tmp_path / "feed.xml"
    src.write_text(RSS_TPL.format(page=3))
    df = from_rss(spark, src.as_uri(), str(tmp_path / "c"))
    assert {r["guid"] for r in df.collect()} == {"3-1", "3-2"}


def test_from_rss_pages_stops_at_missing(spark, tmp_path):
    for i in (1, 2):
        (tmp_path / f"p{i}.xml").write_text(RSS_TPL.format(page=i))

    # Monkeypatch-free pagination: pages resolve as p{N}.xml; page 3 is
    # missing so the iterator stops after two pages.
    import wp_etl_migration_spark.sources.rss as rss

    urls = [(tmp_path / f"p{i}.xml").as_uri() for i in (1, 2, 3)]
    orig = rss.page_urls
    try:
        rss.page_urls = lambda *a, **k: urls
        df = from_rss_pages(spark, "ignored", str(tmp_path / "c"),
                            max_pages=3)
    finally:
        rss.page_urls = orig
    assert {r["guid"] for r in df.collect()} == {"1-1", "1-2",
                                                 "2-1", "2-2"}
