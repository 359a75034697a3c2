"""RSS source with disk cache + multi-page pagination (SURVEY §2.1
S4/S5).

≙ Extract AdapterFactory.php:97-144 (fetch URL, cache the body at
``<cache>/<md5(url)>.xml``, parse as XML) and
RSSMultiSourceIterator.php:15-89 + Extract Orchestrator.php:173-227
(iterate ``?page=N`` URLs by start/increment/max, extract each page,
merge).

Spark-first shape: the HTTP fetch is a *driver-side* concern (one small
feed document per page — never data-plane volume); the parsed pages are
merged with a lazy ``unionByName`` instead of the reference's eager
materialize-and-concat. Fetching honors the cache first, so re-runs and
tests are offline-stable.
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from wp_etl_migration_spark.sources.files import from_xml

DEFAULT_TIMEOUT = 60  # seconds ≙ AdapterFactory.php:118


def fetch_cached(url: str, cache_dir: str,
                 timeout: int = DEFAULT_TIMEOUT) -> str:
    """Fetch ``url`` into ``<cache_dir>/<md5(url)>.xml`` (cache wins);
    returns the local path."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(
        cache_dir, hashlib.md5(url.encode()).hexdigest() + ".xml")
    if not os.path.exists(path):
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            body = resp.read()
        with open(path, "wb") as f:
            f.write(body)
    return path


def from_rss(spark: SparkSession, url: str, cache_dir: str,
             row_tag: str = "item",
             timeout: int = DEFAULT_TIMEOUT) -> DataFrame:
    """Single-feed RSS scan: cached fetch → XML read on the repeating
    node (default ``item`` ≙ node path ``rss/channel/item``)."""
    return from_xml(spark, fetch_cached(url, cache_dir, timeout), row_tag)


def page_urls(base_url: str, param: str = "page", start: int = 1,
              increment: int = 1, max_pages: int = 10) -> list[str]:
    """≙ RSSMultiSourceIterator.php:15-89: ``?<param>=N`` page URLs."""
    sep = "&" if "?" in base_url else "?"
    return [f"{base_url}{sep}{param}={start + i * increment}"
            for i in range(max_pages)]


def from_rss_pages(spark: SparkSession, base_url: str, cache_dir: str,
                   param: str = "page", start: int = 1, increment: int = 1,
                   max_pages: int = 10, row_tag: str = "item",
                   stop_on_error: bool = True) -> DataFrame:
    """Multi-page RSS scan: fetch pages until ``max_pages`` (or the first
    failing page, matching the iterator's stop), merge lazily with
    ``unionByName`` — no driver materialization of row data."""
    dfs: list[DataFrame] = []
    for url in page_urls(base_url, param, start, increment, max_pages):
        try:
            dfs.append(from_rss(spark, url, cache_dir, row_tag))
        except Exception:
            if stop_on_error and dfs:
                break
            if stop_on_error:
                raise
    if not dfs:
        raise ValueError(f"no RSS pages fetched from {base_url}")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True),
                  dfs)
