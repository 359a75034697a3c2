"""Property-based parity: scalar functions vs DuckDB on generated edge-
case strings (empty, punctuation runs, leading/trailing separators…).
The oracle queries cover the synthetic tables; these cover the corners
the tables don't contain. ASCII-printable alphabet — the engine contract
(Java regex vs RE2 unicode case folding differ outside it).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from wp_etl_migration_spark.functions.numbers import preserve_numeric_type
from wp_etl_migration_spark.functions.text import sanitize_key, to_slug
from wp_etl_migration_spark.operators.textstats import (
    fingerprint, token_count)

ASCII = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=40)

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _both(spark, values, spark_expr, duck_expr):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r["out"] for r in
           df.select(spark_expr(F.col("s")).alias("out"))
           .collect()]
    con = duckdb.connect()
    want = [con.execute(f"SELECT {duck_expr} FROM (SELECT ? AS s)",
                        [v]).fetchone()[0]
            for v in values]
    return got, want


@given(vals=st.lists(ASCII, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_to_slug_matches_duckdb(spark, vals):
    got, want = _both(
        spark, vals, to_slug,
        "regexp_replace(regexp_replace(lower(trim(s)), '[^a-z0-9]+', '-',"
        " 'g'), '^-+|-+$', '', 'g')")
    assert got == want


@given(vals=st.lists(ASCII, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_sanitize_key_matches_duckdb(spark, vals):
    got, want = _both(
        spark, vals, sanitize_key,
        "regexp_replace(lower(s), '[^a-z0-9_-]', '', 'g')")
    assert got == want


@given(vals=st.lists(ASCII, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_token_count_matches_duckdb(spark, vals):
    got, want = _both(
        spark, vals, token_count,
        r"CAST(len(string_split_regex(lower(trim(s)), '\s+')) AS BIGINT)")
    assert got == want


@given(vals=st.lists(ASCII, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_fingerprint_matches_duckdb(spark, vals):
    got, want = _both(
        spark, vals, fingerprint,
        r"substring(md5(regexp_replace(lower(trim(s)), '\s+', ' ', 'g')),"
        " 1, 16)")
    assert got == want


@given(vals=st.lists(ASCII, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_scrub_pii_matches_duckdb(spark, vals):
    from wp_etl_migration_spark.operators.pii import PII_PATTERNS, scrub_pii
    duck = "s"
    for _, pat, repl in PII_PATTERNS:
        duck = f"regexp_replace({duck}, '{pat}', '{repl}', 'g')"
    got, want = _both(spark, vals, scrub_pii, duck)
    assert got == want


@given(edges=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=25))
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Spark min-label propagation ≡ plain union-find on random graphs
    (self-loops and duplicate edges included)."""
    from wp_etl_migration_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    nodes = {n for e in edges for n in e}
    want = {}
    for n in sorted(nodes):
        root = find(n)
        want.setdefault(root, n)  # min node per component
    expected = sorted((n, want[find(n)]) for n in nodes)

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = sorted(tuple(r) for r in
                 connected_components(df, max_rounds=40).collect())
    assert got == expected


@given(frac=st.floats(0.0, 1.0), salt=st.text(
    alphabet="abcxyz", max_size=5))
@settings(**SETTINGS)
def test_hash_sample_matches_duckdb(spark, frac, salt):
    from wp_etl_migration_spark.operators.sampling import hash_sample
    df = spark.range(200).withColumnRenamed("id", "s")
    got = sorted(r.s for r in hash_sample(df, "s", frac, salt).collect())
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        f"""SELECT r FROM range(200) t(r)
            WHERE ('0x' || substr(md5('{salt}' || CAST(r AS VARCHAR)),
                                  1, 8))::BIGINT < ?
            ORDER BY r""", [int(frac * (1 << 32))]).fetchall()]
    assert got == want


NUMERIC_ISH = st.one_of(
    st.integers(-10**12, 10**12).map(str),
    st.from_regex(r"-?[0-9]{1,6}\.[0-9]{1,4}", fullmatch=True),
    st.from_regex(r"0[0-9]{1,5}", fullmatch=True),
    ASCII)


@given(vals=st.lists(NUMERIC_ISH, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_preserve_numeric_type_matches_duckdb(spark, vals):
    got, want = _both(
        spark, vals, preserve_numeric_type,
        r"""CASE WHEN regexp_matches(s, '^-?\d+$')
              THEN CAST(CAST(s AS BIGINT) AS VARCHAR)
            WHEN regexp_matches(s, '^-?\d*\.\d+$')
              THEN CAST(CAST(s AS DOUBLE) AS VARCHAR)
            ELSE s END""")
    assert got == want


_HTML_BITS = st.lists(st.sampled_from([
    "<p>", "</p>", '<p class="c">', "<script>", "</script>",
    '<a href="javascript:x()">', '<a href="https://e.com/">', "</a>",
    '<em onclick="h()">', "</em>", "<img src='x'>", "<iframe>",
    "</iframe>", "text ", "&amp;", "<b", ">", '"', "<!-- c -->",
    # Scheme-bypass vectors: browsers strip ASCII tab/newline when
    # parsing URLs, and HTMLParser decodes entity refs in attr values —
    # wp_kses_bad_protocol strips [\x00-\x20] before the scheme check.
    '<a href="jav\tascript:alert(1)">', '<a href="jav&#x09;ascript:x()">',
    '<a href="java\nscript:x()">', '<a href=" javascript:x()">',
    '<img src="jav&#x0A;ascript:y()">',
]), min_size=0, max_size=12).map("".join)


@given(html=_HTML_BITS)
@settings(**SETTINGS)
def test_kses_post_never_emits_disallowed(html):
    """Safety invariants on arbitrary tag soup: no REAL disallowed
    markup survives — a literal ``<`` opening a disallowed tag, an
    event-handler attribute inside an emitted (allowed) tag, a
    javascript: URL attribute inside a tag, or a comment — and the
    sanitize is idempotent. (Escaped ``&lt;…`` text may spell anything;
    it is inert.)"""
    import re
    from wp_etl_migration_spark.functions.text import kses_post_str
    out = kses_post_str(html)
    assert not re.search(r"(?i)<\s*(script|iframe|svg|style)", out)
    assert not re.search(r'(?i)<(p|a|em|b|img)\b[^>]*\bon\w+\s*=', out)
    assert not re.search(r'(?i)<\w[^>]*\bhref="javascript:', out)
    # A javascript: URL must not survive even with embedded whitespace
    # the browser would strip (literal or entity-decoded controls).
    ctrl_stripped = re.sub(r"[\x00-\x20]", "", out)
    assert not re.search(
        r'(?i)<\w[^>]*\b(href|src|cite)="(javascript|vbscript|data):',
        ctrl_stripped)
    assert "<!--" not in out
    assert kses_post_str(out) == out


@given(url=st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=30))
@settings(**SETTINGS)
def test_esc_url_raw_invariants(spark, url):
    """NULL or clean: survivors contain only URL-legal characters and
    never carry a disallowed scheme; the function is idempotent."""
    import re
    from wp_etl_migration_spark.functions.text import esc_url_raw
    df = spark.createDataFrame([(url,)], "s string")
    out = df.select(esc_url_raw(F.col("s")).alias("o")).first()["o"]
    if out is None:
        return
    assert re.fullmatch(r"[a-zA-Z0-9\-._~:/?#\[\]@!$&'()*+,;=%]+", out)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):", out)
    if m:
        assert m.group(1).lower() in {"http", "https", "ftp", "ftps",
                                      "mailto", "tel", "news", "irc"}
    again = df.sparkSession.createDataFrame([(out,)], "s string") \
        .select(esc_url_raw(F.col("s")).alias("o")).first()["o"]
    assert again == out


@given(vec=st.lists(
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False, width=32),
    min_size=1, max_size=12))
@settings(**SETTINGS)
def test_quantize_embeddings_error_bound(spark, vec):
    """For ANY float vector: int8 codes stay in [-127, 127] after
    round-half-up of |v|max-scaled lanes, and every lane reconstructs
    within scale/2 (the symmetric-quantization guarantee)."""
    from wp_etl_migration_spark.operators.similarity import (
        quantize_embeddings)
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(df, "vec_id", "embedding").first()
    assert len(r.qvec) == len(vec)
    assert all(-128 <= q <= 127 for q in r.qvec)
    assert r.max_abs_err <= r.scale / 2 + 1e-9 * max(1.0, r.scale)
    if all(v == 0 for v in vec):
        assert r.scale == 0.0 and r.max_abs_err == 0.0


WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])


@given(docs=st.lists(st.lists(WORD, min_size=0, max_size=10),
                     min_size=1, max_size=6))
@settings(**SETTINGS)
def test_line_dedup_matches_python_oracle(spark, docs):
    """Random small corpora vs a literal Python re-implementation:
    identical surviving text, counts, and ordering for every doc."""
    from wp_etl_migration_spark.operators.dedup import line_dedup
    rows = [(i, " | ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_lines, r.n_removed)
           for r in line_dedup(df, "doc_id", "text", max_line_df=2,
                               delimiter=" | ").collect()}

    split = {i: t.split(" | ") for i, t in rows}
    from collections import Counter
    dfreq = Counter()
    for i, lines in split.items():
        for ln in set(l for l in lines if len(l.strip()) >= 1):
            dfreq[ln] += 1
    hot = {l for l, c in dfreq.items() if c >= 2}
    for i, lines in split.items():
        kept = [l for l in lines
                if not (len(l.strip()) >= 1 and l in hot)]
        assert got[i] == (" | ".join(kept), len(lines),
                          len(lines) - len(kept)), (i, lines)


@given(docs=st.lists(st.lists(WORD, min_size=0, max_size=12),
                     min_size=1, max_size=5),
       k=st.integers(min_value=2, max_value=4))
@settings(**SETTINGS)
def test_remove_shared_passages_matches_python_oracle(spark, docs, k):
    """Random corpora vs literal Python: the exact same token positions
    are cut for every document and k."""
    from wp_etl_migration_spark.operators.textstats import (
        remove_shared_passages)
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed_tokens)
           for r in remove_shared_passages(df, "doc_id", "text",
                                           k=k).collect()}

    toks = {i: t.split(" ") if t else [""] for i, t in rows}
    grams = {i: [tuple(ts[p:p + k]) for p in range(len(ts) - k + 1)]
             for i, ts in toks.items()}
    from collections import Counter
    dfreq = Counter()
    for i, gs in grams.items():
        for g in set(gs):
            dfreq[g] += 1
    shared = {g for g, c in dfreq.items() if c >= 2}
    for i, ts in toks.items():
        covered = set()
        for p, g in enumerate(grams[i]):
            if g in shared:
                covered.update(range(p, p + k))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        assert got[i] == (" ".join(kept), len(ts),
                          len(ts) - len(kept)), (i, ts, k)


@given(keys=st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5),
    min_size=2, max_size=8, unique=True))
@settings(**SETTINGS)
def test_fuzzy_self_join_complete_vs_brute_force(spark, keys):
    """FastSS completeness on arbitrary short keys: the deletion-
    neighborhood join finds EXACTLY the levenshtein<=1 pairs a brute
    force over all pairs finds — no false negatives, no extras."""
    import itertools
    from wp_etl_migration_spark.operators.fuzzy import fuzzy_self_join

    def ed(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(keys)), ["id", "k"])
    got = {(r.id_a, r.id_b): r.distance
           for r in fuzzy_self_join(df, "id", "k").collect()}
    want = {(i, j): ed(keys[i], keys[j])
            for i, j in itertools.combinations(range(len(keys)), 2)
            if ed(keys[i], keys[j]) <= 1}
    assert got == want


@given(docs=st.lists(st.lists(WORD, min_size=0, max_size=14),
                     min_size=1, max_size=4),
       chunk=st.integers(min_value=2, max_value=6),
       overlap=st.integers(min_value=0, max_value=5))
@settings(**SETTINGS)
def test_chunk_documents_matches_python_oracle(spark, docs, chunk,
                                               overlap):
    """Random docs/window/overlap vs literal Python: identical chunk
    boundaries, ids, and texts; invalid overlap rejected."""
    import pytest as _pt
    from wp_etl_migration_spark.operators.textstats import chunk_documents
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if not 0 <= overlap < chunk:
        with _pt.raises(ValueError):
            chunk_documents(df, "doc_id", "text", chunk, overlap)
        return
    got = {}
    for r in chunk_documents(df, "doc_id", "text", chunk,
                             overlap).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = (r.chunk_text,
                                                    r.n_tokens)
    step = chunk - overlap
    for i, t in rows:
        toks = t.split(" ") if t else [""]
        starts = list(range(0, max(len(toks) - overlap, 1), step))
        want = {ci: (" ".join(toks[s:s + chunk]),
                     len(toks[s:s + chunk]))
                for ci, s in enumerate(starts)}
        assert got[i] == want, (i, toks, chunk, overlap)


@given(ks=st.lists(st.integers(min_value=0, max_value=10**6),
                   min_size=1, max_size=40, unique=True),
       n_shards=st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_global_shuffle_matches_python_md5_oracle(spark, ks, n_shards):
    """Shard and position reproduce EXACTLY from hashlib.md5 in plain
    Python — the engine-portability contract (any system computing the
    same md5 construction lands every row identically)."""
    import hashlib
    from wp_etl_migration_spark.operators.sampling import global_shuffle
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    got = {r.k: (r.shard, r.pos)
           for r in global_shuffle(df, "k", n_shards, salt="s").collect()}

    def h(k):
        return int(hashlib.md5(f"s{k}".encode()).hexdigest()[:8], 16)
    want = {}
    per_shard = {}
    for k in sorted(ks, key=lambda k: (h(k) % n_shards, h(k), k)):
        sh = h(k) % n_shards
        per_shard[sh] = per_shard.get(sh, 0) + 1
        want[k] = (sh, per_shard[sh])
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(min_value=0, max_value=50),
              st.sampled_from(["a", "b"])),
    min_size=1, max_size=20),
       lo=st.floats(min_value=0.0, max_value=0.6),
       hi=st.floats(min_value=0.7, max_value=1.0))
@settings(**SETTINGS)
def test_quantile_band_filter_matches_python_oracle(spark, rows, lo,
                                                    hi):
    """Arbitrary scores/groups/bounds vs literal Python rank math:
    identical keep sets (ties broken by id both sides)."""
    from wp_etl_migration_spark.operators.sampling import (
        quantile_band_filter)
    data = [(i, g, float(s)) for i, (s, g) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, src string, "
                                     "score double")
    got = sorted(r.doc_id for r in quantile_band_filter(
        df, "doc_id", "score", lo=lo, hi=hi,
        group_col="src").collect())
    want = []
    for grp in {g for _, g, _ in data}:
        members = sorted([(s, i) for i, g, s in data if g == grp])
        n = len(members)
        for rank, (_, i) in enumerate(members, 1):
            if lo < rank / n <= hi:
                want.append(i)
    assert got == sorted(want)


@given(st.lists(
    st.tuples(st.text(alphabet="abcd", min_size=1, max_size=3),
              st.text(alphabet="abcd", min_size=1, max_size=3),
              st.integers(min_value=1, max_value=1000)),
    max_size=30),
    st.integers(min_value=1, max_value=8))
def test_select_disjoint_batch_invariants(ranked, k):
    """Batched-BPE selection (operators/bpe.select_disjoint_batch):
    the accepted batch is a subsequence of the input order, at most k
    long, never empty when the input isn't, pairwise symbol-disjoint,
    and greedy-maximal (every rejected earlier pair shares a symbol
    with an earlier-accepted one)."""
    from wp_etl_migration_spark.operators.bpe import (
        select_disjoint_batch)
    batch = select_disjoint_batch(ranked, k)
    assert len(batch) <= k
    if ranked:
        assert batch and batch[0] == tuple(ranked[0][:2])
    # subsequence of the input order
    it = iter([tuple(r[:2]) for r in ranked])
    assert all(p in it for p in batch)
    # pairwise symbol-disjoint
    seen: set = set()
    for a, b in batch:
        assert a not in seen and b not in seen
        seen.update((a, b, a + b))
    # greedy-maximal: any pair skipped while acceptances remained
    # must have overlapped the symbols accepted before its turn
    accepted: set = set()
    taken = list(batch)
    for a, b, _n in ranked:
        if taken and (a, b) == taken[0]:
            accepted.update((a, b, a + b))
            taken.pop(0)
        elif taken:
            assert a in accepted or b in accepted
