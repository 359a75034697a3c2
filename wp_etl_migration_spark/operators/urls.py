"""URL operators for web-corpus pipelines.

Not present in the reference (its sources are WordPress/RSS/file
scans); these are LLM-data-pipeline extensions: every web-scale
training corpus (Common Crawl derivatives, C4, RefinedWeb, Dolma)
keys its curation on URLs — per-domain caps, domain blocklists,
tracking-parameter stripping before exact dedup (otherwise the same
page under ``?utm_source=a`` / ``?utm_source=b`` survives twice).

Everything here is plain column expressions (regexp_extract / split /
higher-order array functions) — JVM-side, no UDFs, no shuffles; the
only shuffling operators are the explicit aggregations
(:func:`domain_stats`) and joins (:func:`join_domain_blocklist`),
each one-shuffle on a uniform key.

Parsing is REGEX-based rather than ``F.parse_url`` so the DuckDB
oracles can share the exact same patterns (``parse_url`` calls into
java.net.URI whose edge-case behavior no other engine reproduces).
Patterns use only basic character classes — portable across Java
regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Capture groups shared verbatim with the DuckDB oracles.
SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = r"\?([^#]*)"

#: Multi-label public suffixes (abridged, the high-traffic entries of
#: the Mozilla Public Suffix List — enough for registered-domain
#: grouping; swap in the full PSL as a broadcast join for production).
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "com.cn", "com.mx", "com.ar", "com.tr", "com.sg",
    "co.in", "co.kr", "co.za", "co.id", "com.hk", "com.tw",
)

#: Query parameters that identify a click, not a resource — dropped by
#: :func:`normalize_url` (prefix match for utm_*, exact for the rest).
TRACKING_PARAM_RE = (
    "^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref|igshid)=")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(col: Column | str) -> Column:
    """Lower-cased scheme; '' when the value has no ``scheme://``."""
    return F.lower(F.regexp_extract(_c(col), SCHEME_RE, 1))


def url_hostport(col: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(col), HOSTPORT_RE, 1))


def url_host(col: Column | str) -> Column:
    """Lower-cased host without the port."""
    return F.regexp_extract(url_hostport(col), "^([^:]*)", 1)


def url_port(col: Column | str) -> Column:
    """Explicit port as a string ('' when absent)."""
    return F.regexp_extract(url_hostport(col), ":([0-9]+)$", 1)


def url_path(col: Column | str) -> Column:
    """Path; '' when absent (callers decide whether '' means '/')."""
    return F.regexp_extract(_c(col), PATH_RE, 1)


def url_query(col: Column | str) -> Column:
    """Query string without the '?' ('' when absent)."""
    return F.regexp_extract(_c(col), QUERY_RE, 1)


def registered_domain(host: Column | str) -> Column:
    """Registered (pay-level) domain of a host: the last two labels,
    or three when the last two form a known multi-label public suffix
    ('docs.example.co.uk' → 'example.co.uk'). Hosts with fewer labels
    pass through unchanged. Pure array expressions — no UDF."""
    h = _c(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), F.element_at(
        labels, -2), F.element_at(labels, -1))
    is_2label_suffix = last2.isin(*TWO_LABEL_SUFFIXES)
    return (F.when(n >= 3, F.when(is_2label_suffix, last3)
                   .otherwise(last2))
            .when(n == 2, last2)
            .otherwise(h))


def strip_tracking_params(query: Column | str) -> Column:
    """Drop tracking parameters from a query string, preserving the
    order of the survivors ('' when everything was tracking)."""
    q = _c(query)
    kept = F.filter(F.split(q, "&"),
                    lambda p: ~p.rlike(TRACKING_PARAM_RE)
                    & (p != F.lit("")))
    return F.array_join(kept, "&")


def normalize_url(col: Column | str) -> Column:
    """Canonical form for URL-keyed dedup and grouping:

    - scheme and host lower-cased;
    - default ports dropped (http:80 / https:443), others kept;
    - empty path becomes '/';
    - tracking parameters removed (:data:`TRACKING_PARAM_RE`),
      remaining parameters kept in original order, '?' dropped when
      none survive;
    - fragment always dropped.

    Values without a ``scheme://`` pass through unchanged (opaque ids,
    relative links — nothing safe to normalize).
    """
    u = _c(col)
    scheme = url_scheme(u)
    host = url_host(u)
    port = url_port(u)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")))
    path = url_path(u)
    q = strip_tracking_params(url_query(u))
    rebuilt = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return F.when(scheme == "", u).otherwise(rebuilt)


def join_domain_blocklist(df: DataFrame, blocklist: DataFrame,
                          url_col: str, domain_col: str = "domain",
                          mode: str = "block",
                          broadcast: bool = True) -> DataFrame:
    """Filter ``df`` by a domain list: anti-join on the registered
    domain (``mode='block'``) or semi-join (``mode='allow'``).

    ``broadcast=True`` (default) pins the list map-side — right for
    the usual curated lists (thousands to low millions of rows):
    document rows stream through, nothing shuffles. For a list too
    big to broadcast (a full crawl-wide reputation table), pass
    ``broadcast=False`` to shuffle both sides on the domain instead —
    still only (domain) keys plus ``df``'s rows move, and the hot-key
    skew of real domain distributions sits on the PROBE side of a
    semi/anti join (every probe row of one key lands in one reducer
    with a single build row), which AQE's skew-join splitting
    handles; the blocklist side is distinct-keyed by construction."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    tagged = df.withColumn("__dom", registered_domain(url_host(url_col)))
    right = blocklist.select(F.col(domain_col).alias("__dom")).distinct()
    if broadcast:
        right = F.broadcast(right)
    how = "left_anti" if mode == "block" else "left_semi"
    return tagged.join(right, "__dom", how).drop("__dom")


def domain_stats(df: DataFrame, url_col: str) -> DataFrame:
    """Per-registered-domain document counts: (domain, n_docs, share).

    ``share`` is a single exact-integer division (parity-stable).
    One uniform-key shuffle on the domain; the grand total arrives as
    a broadcast one-row cross join (the key_skew/vocab_topk totals
    pattern — an unpartitioned window here would funnel every domain
    row through ONE reducer, the exact vocab_build regression fixed in
    round 5), so the per-domain division stays fully parallel."""
    counts = (df.select(registered_domain(url_host(url_col))
                        .alias("domain"))
              .groupBy("domain").agg(F.count("*").alias("n_docs")))
    total = counts.agg(F.sum("n_docs").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("domain", "n_docs",
                    (F.col("n_docs").cast("double")
                     / F.col("__total").cast("double")).alias("share")))
