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

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Capture groups shared verbatim with the DuckDB oracles.
SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
HOSTPORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
#: Everything before the first '#' — query extraction runs over THIS
#: prefix, never the raw URL: an unanchored ``\?`` over the raw value
#: would claim a '?' living inside the fragment (SPA routes like
#: ``/app#/route?tab=1``) as the query, violating the fragment-dropped
#: contract (round-6 advisory).
PREFRAG_RE = "^([^#]*)"
QUERY_RE = r"\?([^#]*)"
#: Host within a hostport: a bracketed IPv6 literal ``[::1]`` wins the
#: alternation (leftmost-preferred in both Java regex and RE2), else
#: everything before the port colon.
HOST_RE = r"^(\[[^\]]*\]|[^:]*)"

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
    """Lower-cased host INCLUDING any explicit port (→ :func:`url_host`
    strips it)."""
    return F.lower(F.regexp_extract(_c(col), HOSTPORT_RE, 1))


def url_host(col: Column | str) -> Column:
    """Lower-cased host without the port.

    Userinfo (``user:pw@host``) is ignored — the host is whatever
    follows the LAST '@' of the hostport — and a bracketed IPv6
    literal is returned brackets included (``[::1]``), never split at
    its internal colons."""
    after_user = F.substring_index(url_hostport(col), "@", -1)
    return F.regexp_extract(after_user, HOST_RE, 1)


def url_port(col: Column | str) -> Column:
    """Explicit port as a string ('' when absent). Safe for userinfo
    and IPv6 literals: anchored at the end, so ``user:80@host`` has no
    port and ``[::1]:8080`` yields ``8080``."""
    return F.regexp_extract(url_hostport(col), ":([0-9]+)$", 1)


def url_path(col: Column | str) -> Column:
    """Path; '' when absent (callers decide whether '' means '/')."""
    return F.regexp_extract(_c(col), PATH_RE, 1)


def url_query(col: Column | str) -> Column:
    """Query string without the '?' ('' when absent).

    Extracted from the pre-fragment prefix, so a '?' whose first
    occurrence is inside the fragment (``/app#/route?tab=1``) is NOT
    a query — the fragment is opaque and always dropped."""
    prefrag = F.regexp_extract(_c(col), PREFRAG_RE, 1)
    return F.regexp_extract(prefrag, QUERY_RE, 1)


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


#: Abridged snapshot of the Mozilla Public Suffix List
#: (publicsuffix.org, MPL-2.0, public data) in the PSL's own line
#: format: plain rules, ``*.`` wildcards, ``!`` exceptions. This is
#: the no-download default for :func:`psl_rules`; pass
#: ``path=/your/public_suffix_list.dat`` for the full list — the
#: parser accepts the real file unchanged (comments, section markers,
#: blank lines). Chosen to cover the suffixes that actually mis-group
#: web crawls under a naive last-two-labels rule: ccSLDs (co.uk,
#: com.pl, co.il, …), private-section hosting suffixes (github.io,
#: blogspot.com, …), and the wildcard/exception machinery (*.ck /
#: !www.ck).
PSL_SNAPSHOT = """
// ICANN section (abridged)
com
org
net
edu
gov
io
ai
dev
app
uk
co.uk
org.uk
ac.uk
gov.uk
me.uk
ltd.uk
plc.uk
au
com.au
net.au
org.au
edu.au
gov.au
nz
co.nz
net.nz
org.nz
jp
co.jp
ne.jp
or.jp
ac.jp
go.jp
br
com.br
net.br
org.br
gov.br
cn
com.cn
net.cn
org.cn
gov.cn
mx
com.mx
org.mx
ar
com.ar
tr
com.tr
sg
com.sg
in
co.in
net.in
org.in
kr
co.kr
za
co.za
org.za
id
co.id
hk
com.hk
tw
com.tw
il
co.il
org.il
ac.il
pl
com.pl
net.pl
org.pl
de
fr
it
nl
es
ru
com.ru
ca
us
ck
*.ck
!www.ck
bd
*.bd
kw
*.kw
er
*.er
// Private section (abridged)
github.io
githubusercontent.com
gitlab.io
blogspot.com
blogspot.co.uk
blogspot.com.au
blogspot.in
wordpress.com
tumblr.com
netlify.app
vercel.app
herokuapp.com
web.app
firebaseapp.com
pages.dev
workers.dev
cloudfront.net
amazonaws.com
s3.amazonaws.com
azurewebsites.net
"""


def parse_psl(text: str) -> list[tuple[str, int, int]]:
    """Parse PSL-format text into ``(suffix, kind, labels)`` rows.

    ``kind``: 0 = normal rule, 1 = wildcard (``*.foo`` stored as
    ``foo``), 2 = exception (``!bar.foo`` stored as ``bar.foo``).
    ``labels`` is the label count of the PUBLIC SUFFIX the rule
    denotes when it prevails: the stored labels for normal rules, +1
    for wildcards (the ``*`` consumes one host label), −1 for
    exceptions (the exception's leftmost label is the registrable
    one). Comment (``//``) and blank lines are skipped, so the real
    ``public_suffix_list.dat`` parses unchanged."""
    rules: list[tuple[str, int, int]] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        # the real file is one rule per line; anything after
        # whitespace is commentary per the PSL spec
        line = line.split()[0].lower()
        if line.startswith("!"):
            suffix = line[1:]
            rules.append((suffix, 2, suffix.count(".")))
        elif line.startswith("*."):
            suffix = line[2:]
            rules.append((suffix, 1, suffix.count(".") + 2))
        else:
            rules.append((line, 0, line.count(".") + 1))
    return rules


def psl_rules(spark, path: str | None = None) -> DataFrame:
    """PSL rules as a DataFrame ``(suffix, kind, ps_labels)`` —
    broadcast-sized (~10k rows for the full list). ``path`` reads a
    real ``public_suffix_list.dat``; default is the embedded
    :data:`PSL_SNAPSHOT`."""
    if path is not None:
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    else:
        text = PSL_SNAPSHOT
    return spark.createDataFrame(
        parse_psl(text), "suffix string, kind int, ps_labels int")


def default_psl_rules(spark) -> DataFrame | None:
    """The session's CONFIGURED PSL frame, or ``None``.

    The one config knob for PSL-correct domain grouping (VERDICT r7
    #5): when ``$SPARK_GRAFT_PSL_PATH`` names a standard
    ``public_suffix_list.dat``, every domain-grouping operator that
    takes ``psl=None`` (:func:`domain_stats`,
    :func:`join_domain_blocklist`) resolves registered domains
    through the full PSL join path by default — ``a.github.io`` and
    ``b.github.io`` group separately, as real crawls need. Unset, the
    operators keep the zero-dependency expression path
    (:func:`registered_domain` over the abridged
    ``TWO_LABEL_SUFFIXES``), which is also what the SQL parity
    oracles replicate."""
    path = os.environ.get("SPARK_GRAFT_PSL_PATH")
    if not path:
        return None
    return psl_rules(spark, path=path)


#: Longest host (in labels) for which PSL candidate suffixes are
#: generated. The longest rule in the full PSL is 5 labels, so 8
#: bounds the explode fan-out without ever missing a match.
_PSL_MAX_DEPTH = 8


def resolve_registered_domain(hosts: DataFrame, rules: DataFrame,
                              host_col: str = "host",
                              out_col: str = "domain") -> DataFrame:
    """Registered (registrable) domain per host under the full PSL
    algorithm: among matching rules the exception rule prevails, else
    the one denoting the most public-suffix labels; no match falls
    back to the implicit ``*`` rule (TLD = 1 label). The registered
    domain is the public suffix plus one label; a host that IS a
    public suffix (or has fewer labels) passes through unchanged —
    same pass-through the expression path uses, so the two modes
    disagree only where the suffix data differs.

    Intended input is the DISTINCT hosts of a corpus (call through
    :func:`with_registered_domain_psl` for the join-back): per-host
    work is an ≤8-way candidate explode, two broadcast equi-joins
    against the rules, and one groupBy on the host — all linear in
    distinct hosts, never in corpus rows.

    Wildcard matching note: ``*.ck`` must match host ``foo.ck``
    itself (public suffix = the wildcard-consumed form), which in
    candidate terms means the candidate's PARENT equals the stored
    wildcard suffix — hence the second join keyed on the candidate
    with its first label stripped.
    """
    h = F.col(host_col)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    cand = (hosts
            .withColumn("__n", n)
            .withColumn("__cand_k", F.explode(F.sequence(
                F.lit(1), F.least(F.col("__n"),
                                  F.lit(_PSL_MAX_DEPTH)))))
            .withColumn("__cand", F.concat_ws(
                ".", F.slice(labels, F.col("__n") - F.col("__cand_k")
                             + 1, F.col("__cand_k")))))
    exact = (cand.join(
        F.broadcast(rules.filter(F.col("kind") != 1)),
        cand["__cand"] == rules["suffix"], "inner"))
    # wildcard: candidate (depth ≥ 2) whose parent equals the stored
    # suffix — strip the candidate's first label to get the parent
    wild_parent = F.expr(
        "substring(__cand, instr(__cand, '.') + 1)")
    wild = (cand.filter(F.col("__cand_k") >= 2)
            .withColumn("__parent", wild_parent)
            .join(F.broadcast(rules.filter(F.col("kind") == 1)),
                  F.col("__parent") == rules["suffix"], "inner")
            .drop("__parent"))
    matched = exact.unionByName(wild)
    # prevailing rule: exception beats everything, else most labels
    priority = (F.when(F.col("kind") == 2, F.lit(1_000_000))
                .otherwise(0) + F.col("ps_labels"))
    best = (matched
            .groupBy(host_col)
            .agg(F.max_by("ps_labels", priority).alias("__ps")))
    resolved = (hosts
                .join(best, host_col, "left")
                .withColumn("__ps", F.coalesce(F.col("__ps"),
                                               F.lit(1))))
    reg_n = F.col("__ps") + 1
    reg = F.concat_ws(".", F.slice(labels, n - reg_n + 1, reg_n))
    return (resolved
            .withColumn(out_col,
                        F.when(n > F.col("__ps"), reg).otherwise(h))
            .drop("__ps"))


def with_registered_domain_psl(df: DataFrame, url_col: str,
                               rules: DataFrame,
                               out_col: str = "domain") -> DataFrame:
    """Tag every row with its PSL registered domain: resolve over the
    DISTINCT hosts (web corpora repeat hosts massively — the rules
    machinery runs on the small side), then join the mapping back on
    the host. The join-back is a plain equi-join on the host; AQE
    broadcasts it when the distinct-host set is small, and at full
    crawl scale it shuffles on the host key only."""
    tagged = df.withColumn("__host", url_host(url_col))
    hosts = tagged.select("__host").distinct()
    mapping = resolve_registered_domain(
        hosts, rules, host_col="__host", out_col=out_col)
    return tagged.join(mapping, "__host", "left").drop("__host")


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
    - fragment always dropped — including any '?' that lives inside
      it (``#/route?tab=1`` contributes neither query nor fragment);
    - userinfo (``user:pw@``) dropped: it identifies a session, not
      the resource, and normalized URLs are dedup keys.

    Passed through OPAQUE, byte-for-byte (deliberate — each transform
    below can change meaning on some server, so none is safe for a
    generic dedup key):

    - percent-encoding: neither decoded nor re-encoded (``%2F`` vs
      ``/`` is a real distinction);
    - the path: no ``//`` collapsing, no ``.``/``..`` dot-segment
      resolution;
    - IDN hosts: punycode (``xn--…``) and raw Unicode are distinct
      keys; only ASCII lower-casing is applied, no IDNA transform;
    - IPv6 literals: kept bracketed, internal colons untouched.

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
                          broadcast: bool = True,
                          psl: DataFrame | None | bool = None
                          ) -> DataFrame:
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
    if psl is True:
        raise ValueError(
            "psl must be a rules DataFrame, None (use the configured "
            "default), or False (pin the expression path) — not True")
    if psl is None:
        psl = default_psl_rules(df.sparkSession)
    elif psl is False:
        # Explicitly pinned expression path: ignore the env knob —
        # oracle-parity callers need results that cannot change with
        # the environment.
        psl = None
    if psl is not None:
        tagged = with_registered_domain_psl(df, url_col, psl,
                                            out_col="__dom")
    else:
        tagged = df.withColumn("__dom",
                               registered_domain(url_host(url_col)))
    right = blocklist.select(F.col(domain_col).alias("__dom")).distinct()
    if broadcast:
        right = F.broadcast(right)
    how = "left_anti" if mode == "block" else "left_semi"
    return tagged.join(right, "__dom", how).drop("__dom")


def domain_stats(df: DataFrame, url_col: str,
                 psl: DataFrame | None | bool = None) -> DataFrame:
    """Per-registered-domain document counts: (domain, n_docs, share).

    ``share`` is a single exact-integer division (parity-stable).
    One uniform-key shuffle on the domain; the grand total arrives as
    a broadcast one-row cross join (the key_skew/vocab_topk totals
    pattern — an unpartitioned window here would funnel every domain
    row through ONE reducer, the exact vocab_build regression fixed in
    round 5), so the per-domain division stays fully parallel.

    ``psl`` (a :func:`psl_rules` frame) switches registered-domain
    extraction to the full PSL algorithm. Cost shape is unchanged:
    counts aggregate by HOST first (the shuffle the default path pays
    on the domain anyway), then the PSL resolve runs on the tiny
    host-level frame and re-aggregates — the rules machinery never
    touches corpus rows. With ``psl=None`` the configured default
    applies (:func:`default_psl_rules` — the ``$SPARK_GRAFT_PSL_PATH``
    knob), falling back to the expression path when unconfigured.
    ``psl=False`` PINS the expression path, ignoring the env knob —
    what the driver-gate / oracle-parity queries pass so a configured
    environment cannot silently change their results."""
    if psl is True:
        raise ValueError(
            "psl must be a rules DataFrame, None (use the configured "
            "default), or False (pin the expression path) — not True")
    if psl is None:
        psl = default_psl_rules(df.sparkSession)
    elif psl is False:
        psl = None
    if psl is not None:
        host_counts = (df.select(url_host(url_col).alias("host"))
                       .groupBy("host")
                       .agg(F.count("*").alias("n_docs")))
        counts = (resolve_registered_domain(host_counts, psl)
                  .groupBy("domain")
                  .agg(F.sum("n_docs").alias("n_docs")))
    else:
        counts = (df.select(registered_domain(url_host(url_col))
                            .alias("domain"))
                  .groupBy("domain").agg(F.count("*").alias("n_docs")))
    total = counts.agg(F.sum("n_docs").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("domain", "n_docs",
                    (F.col("n_docs").cast("double")
                     / F.col("__total").cast("double")).alias("share")))
