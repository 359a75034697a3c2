"""Skewed-corpus robustness bed (VERDICT r5 #2).

Real web corpora are not uniform: one boilerplate line appears in 30%
of documents, one document is mirrored 10k times, one domain owns a
third of the crawl. The dedup/shingle/sampling paths are benched on
near-uniform synthetic keys, so this suite builds a deterministic
pathological fixture and asserts the skew-sensitive operators
(``line_dedup``, ``ngram_jaccard_pairs`` with its hot-shingle cap,
``vocab_build``, ``cap_per_key``) both answer correctly AND run with
bounded per-task skew, measured as max/median shuffle-read records
per stage from Spark's own REST metrics (AQE partition coalescing is
disabled during the probe so the task distribution is observable).

The bound asserted is structural, not a tuning accident: every one of
these operators pre-reduces or splits its hot keys (map-side combine
for line/token counts, doc-frequency capping before the shingle pair
join, per-(key, id-bucket) partial top-n in ``cap_per_key``), so the
hot key reaches any single reducer pre-shrunk. Measured numbers are
recorded in SCALE.md.
"""

from __future__ import annotations

import contextlib
import json
import random
import urllib.request

import pytest
from pyspark.sql import functions as F

from tests.test_plan_equivalence import _forced_shuffle

#: a stage must move at least this many rows before its distribution
#: is judged (tiny stages are all noise)
MIN_STAGE_RECORDS = 2000
#: max task may carry at most this multiple of the median task
SKEW_RATIO = 3.0
#: absolute slack for integer/rounding effects on small medians
SKEW_SLACK = 64

BOILER = "subscribe to our newsletter for daily updates and offers"
HOT_DOMAIN = "hot.example"
HOT_TEXT = ("mirror mirror of the same press release body repeated "
            "verbatim across every syndication partner site today")
N_MIRRORS = 10_000


@pytest.fixture(scope="module")
def skew_docs(spark):
    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    for i in range(1200):
        words = [vocab[rng.randrange(500)] for _ in range(28)]
        text = " ".join(words)
        if i % 3 == 0:
            text = BOILER + " | " + text
        domain = HOT_DOMAIN if i % 2 == 0 \
            else f"site{i % 40}.example"
        rows.append((i, text, domain))
    for j in range(N_MIRRORS):
        rows.append((10_000 + j, HOT_TEXT, HOT_DOMAIN))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .repartition(16).localCheckpoint(eager=True)


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}{path}",
            timeout=30) as r:
        return json.loads(r.read())


def _probe_skew(spark, action):
    """Run ``action`` (must trigger its own job) under forced shuffle
    parallelism; return (result, stats) where stats is one dict per
    new completed stage that read >= MIN_STAGE_RECORDS shuffle rows:
    {stage, records, max, median, ratio}."""
    seen = {(s["stageId"], s["attemptId"])
            for s in _rest(spark, "/stages")}
    with _forced_shuffle(spark):
        out = action()
    stats = []
    for s in _rest(spark, "/stages"):
        if (s["stageId"], s["attemptId"]) in seen \
                or s["status"] != "COMPLETE" \
                or s.get("shuffleReadRecords", 0) < MIN_STAGE_RECORDS:
            continue
        ts = _rest(spark,
                   f"/stages/{s['stageId']}/{s['attemptId']}"
                   "/taskSummary?quantiles=0.0,0.5,1.0")
        lo, med, hi = ts["shuffleReadMetrics"]["readRecords"]
        stats.append({"stage": s["stageId"],
                      "records": s["shuffleReadRecords"],
                      "tasks": s["numCompleteTasks"],
                      "max": hi, "median": med,
                      "ratio": hi / med if med else float("inf")})
    return out, stats


def _assert_bounded(name, stats, abs_cap=0):
    """Every judged stage must satisfy the max/median ratio bound OR
    (where the operator routes a capped candidate set to one reducer
    by design) an absolute per-task row cap that is independent of
    corpus size — that constant-vs-N distinction is exactly what
    "survives 100×" means for a skewed key."""
    assert stats, f"{name}: no shuffle stage moved enough rows to judge"
    for st in stats:
        ok_ratio = st["max"] <= SKEW_RATIO * st["median"] + SKEW_SLACK
        ok_abs = abs_cap and st["max"] <= abs_cap
        assert ok_ratio or ok_abs, (
            f"{name}: stage {st['stage']} task skew {st['max']:.0f} "
            f"max vs {st['median']:.0f} median over {st['tasks']} "
            f"tasks — hot key reached a reducer unreduced: {stats}")


def test_line_dedup_hot_line_bounded(spark, skew_docs):
    """One line in 30% of docs + one full doc mirrored 10k×: both are
    boilerplate at max_line_df=3 and must vanish from every doc, with
    the line-frequency exchange arriving map-side pre-reduced."""
    from wp_etl_migration_spark.operators.dedup import line_dedup

    def act():
        out = line_dedup(skew_docs, "doc_id", "text",
                         max_line_df=3, delimiter=" | ")
        return {r.doc_id: r for r in out.collect()}

    got, stats = _probe_skew(spark, act)
    assert len(got) == 1200 + N_MIRRORS
    # boilerplate line stripped, body kept, order preserved
    assert got[0].text.count(BOILER) == 0
    assert got[0].n_removed == 1 and got[0].n_lines == 2
    assert got[1].n_removed == 0
    # the mirrored doc is ALL boilerplate -> empty text survives
    assert got[10_005].text == "" and got[10_005].n_removed == 1
    _assert_bounded("line_dedup", stats)


def test_ngram_jaccard_hot_shingle_cap_bounded(spark, skew_docs):
    """10k mirrored docs share every shingle; the doc-frequency cap
    must drop those shingles BEFORE the pair join (the exact-dup
    family is the exact pass's job), so no mirror×mirror candidate
    pairs explode through the shuffle."""
    from wp_etl_migration_spark.operators.dedup import (
        ngram_jaccard_pairs)

    def act():
        pairs = ngram_jaccard_pairs(skew_docs, "doc_id", "text",
                                    threshold=0.5, max_doc_freq=20)
        return [(r.id_a, r.id_b) for r in pairs.collect()]

    got, stats = _probe_skew(spark, act)
    # no pair between two mirrors (ids >= 10_000): their shingles all
    # exceeded the cap
    assert not [p for p in got if p[0] >= 10_000 and p[1] >= 10_000]
    _assert_bounded("ngram_jaccard_pairs", stats)


def test_vocab_build_hot_token_bounded(spark, skew_docs):
    """The mirrored doc's tokens dominate the corpus; partial (map
    side) aggregation must pre-reduce them so no reducer receives the
    hot token row-at-a-time."""
    from wp_etl_migration_spark.operators.textstats import vocab_build

    def act():
        return {r.token: (r.n, r.rank) for r in
                vocab_build(skew_docs, "text", top_k=50).collect()}

    got, stats = _probe_skew(spark, act)
    # 'mirror' appears twice per mirrored doc
    assert got["mirror"][0] == 2 * N_MIRRORS
    assert got["mirror"][1] == 1          # the hottest token
    # uniform vocab tokens: 1200 docs * 28 draws / 500 tokens ~ 67
    assert got["the"][0] >= N_MIRRORS     # also in every mirror
    _assert_bounded("vocab_build", stats)


def test_cap_per_key_hot_domain_bounded(spark, skew_docs):
    """One domain owns ~90% of the corpus. The two-phase top-n must
    (a) keep exactly max_per_key docs for it, identical to the
    single-window answer, and (b) split the hot key across id-hash
    buckets so no task reads the whole domain."""
    from pyspark.sql import Window
    from wp_etl_migration_spark.operators.sampling import cap_per_key

    def act():
        kept = cap_per_key(skew_docs.select("doc_id", "source"),
                           "doc_id", "source", max_per_key=15,
                           salt="skew|")
        return sorted((r.doc_id, r.source) for r in kept.collect())

    got, stats = _probe_skew(spark, act)
    per_key = {}
    for _id, src in got:
        per_key[src] = per_key.get(src, 0) + 1
    assert per_key[HOT_DOMAIN] == 15
    assert all(n <= 15 for n in per_key.values())
    # exact equivalence with the one-window form
    draw = F.md5(F.concat(F.lit("skew|"),
                          F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(draw.asc(),
                                             F.col("doc_id").asc())
    want = sorted((r.doc_id, r.source) for r in
                  skew_docs.select("doc_id", "source")
                  .withColumn("__rk", F.row_number().over(w))
                  .where(F.col("__rk") <= 15).drop("__rk").collect())
    assert got == want
    # phase-1 stages obey the ratio bound (hot key splits over 32
    # id-hash buckets); the phase-2 stage routes at most
    # n_buckets × max_per_key + per-uniform-key rows to one reducer —
    # a CONSTANT in corpus size (the pre-fix single window read the
    # whole 10k-row domain in one task here).
    _assert_bounded("cap_per_key", stats,
                    abs_cap=32 * 15 + SKEW_SLACK)


def test_pagerank_hot_hub_bounded(spark, skew_docs):
    """A hub node every page links to (the real shape of domain link
    graphs: everyone cites the big sites). The per-step contribution
    aggregation must arrive at the hub's reducer map-side pre-reduced
    (sum of longs is combinable), and the rank join must stay keyed on
    the uniform source side — per-task rows bounded regardless of the
    hub's in-degree. (The converse hot OUT-degree hub skews the
    edges⋈ranks join by design; that is AQE skew-join territory and
    documented in the operator.) Values are checked exactly against
    the driver-side integer reference — skew handling must not change
    a single rank unit."""
    from tests.test_graph import _pagerank_py
    from wp_etl_migration_spark.operators.graph import pagerank

    HUB = 50_000
    edges = ([(int(r.doc_id), HUB) for r in
              skew_docs.select("doc_id").collect()]
             + [(int(r.doc_id), 20_000 + (int(r.doc_id) * 7) % 40)
                for r in skew_docs.select("doc_id").collect()])
    edf = spark.createDataFrame(edges, "src long, dst long") \
        .repartition(16).localCheckpoint(eager=True)

    def act():
        return {r.node: r.rank for r in
                pagerank(edf, iterations=2).collect()}

    got, stats = _probe_skew(spark, act)
    want = _pagerank_py(edges, 2)
    assert got == want
    assert got[HUB] == max(got.values())
    # The contribution stages have ~42 distinct keys over the forced
    # partitions, so most reducers read 0 rows and max/median is
    # meaningless there; the structural bound is absolute — the
    # combiner emits at most ONE partial per (map task, key), so the
    # hub's reducer reads <= maps × its-few-keys rows no matter how
    # many pages link to it (unreduced it would read all 22k+ edge
    # rows in one task here).
    from tests.test_plan_equivalence import FORCED_PARTS
    _assert_bounded("pagerank", stats,
                    abs_cap=4 * FORCED_PARTS + SKEW_SLACK)
    # and the pre-reduction is visible in stage totals: the smallest
    # judged exchange moved partials, not edges
    assert min(st["records"] for st in stats) < len(edges) // 4


def test_assign_new_ids_hot_slug_bounded(spark):
    """The composed-journey hot-slug case (VERDICT r6 #5): 10k incoming
    rows share ONE (post_name, post_type). The range partitioner alone
    would hand the whole hot key to a single task (measured 10,000
    max / 1 median before the full-row-tiebreak fix); with the md5
    tiebreak joined into the range key, equal keys split across
    boundaries and per-task rows stay a small multiple of the fair
    share — a constant in the hot key's multiplicity. IDs must remain
    the exact global (cols, tiebreak) rank AND be run-to-run
    deterministic even for the duplicated key."""
    from tests.test_plan_equivalence import FORCED_PARTS
    from wp_etl_migration_spark.sinks.wordpress import assign_new_ids

    rows = [("hot-press-release", "post", i) for i in range(10_000)]
    rows += [(f"slug-{i}", "post", 100_000 + i) for i in range(800)]
    df = spark.createDataFrame(
        rows, "name string, type string, payload long") \
        .repartition(16).localCheckpoint(eager=True)
    n = len(rows)

    def act():
        out = assign_new_ids(df, "ID", 1000, ["name", "type"])
        return {(r.name, r.payload): r.ID for r in out.collect()}

    got, stats = _probe_skew(spark, act)
    # dense, unique, start-anchored
    assert len(got) == n and len(set(got.values())) == n
    assert min(got.values()) == 1000 and max(got.values()) == 1000 + n - 1
    # hot-key block is contiguous in rank space (all sort before
    # "slug-*"), uniform rows keep pure key order
    hot_ids = sorted(v for (nm, _p), v in got.items()
                     if nm == "hot-press-release")
    assert hot_ids == list(range(1000, 11_000))
    # deterministic across a fresh materialization, including ties
    rerun, _ = _probe_skew(spark, act)
    assert rerun == got
    # fair share ~ n / FORCED_PARTS; range-sample boundary error is a
    # small constant multiple of it, NOT the hot key's 10k multiplicity
    fair = -(-n // FORCED_PARTS)
    _assert_bounded("assign_new_ids", stats,
                    abs_cap=6 * fair + SKEW_SLACK)
    assert all(st["max"] < 10_000 for st in stats), \
        "a task swallowed the whole hot key"


@contextlib.contextmanager
def _large_dim_regime(spark):
    """Simulate the 100 TB regime at test scale: dimension sides too
    big to broadcast (forced shuffle joins) and AQE skew-join
    thresholds scaled down to test-sized partitions (production
    defaults — 256 MB / factor 5 — are exactly right for real hot
    partitions, which dwarf them; a 10k-row test key compresses to a
    few KB and would never trip them)."""
    saved = {}
    for k, v in (("spark.sql.autoBroadcastJoinThreshold", "-1"),
                 ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
                 # mid-pipeline joins feed further exchanges, where
                 # OptimizeSkewedJoin declines unless forced
                 ("spark.sql.adaptive.forceOptimizeSkewedJoin", "true"),
                 ("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                  "2"),
                 ("spark.sql.adaptive.skewJoin."
                  "skewedPartitionThresholdInBytes", "1KB"),
                 ("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                  "1KB")):
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_post_upsert_hot_slug_one_id_bounded(spark):
    """The wp_post_all journey shape under a hot slug: 10k incoming
    rows collide on one (post_name, post_type) with NO existing match.
    Probe-before-insert semantics require they all resolve to ONE
    minted id (the reference creates on first occurrence, finds it for
    the rest — WordPressPostLoader.php:172-194) and the posts table
    gains exactly one row per distinct new key. Run under the
    large-dim regime (no broadcasts at all), so every probe/id join is
    a shuffle join carrying the hot key — the bed then requires that
    no task swallows it whole: the distinct() pre-collapses it before
    any id work, AQE skew-join splits the one remaining hot SMJ
    partition (measured: 10,019-row task unsplit → 1,276 max split),
    and the final one-row-per-ID collapse arrives pre-reduced via
    Spark's window group-limit pushdown."""
    from wp_etl_migration_spark.sinks.wordpress import post_upsert_stage

    HOT = 10_000
    rows = [(None, "hot-press-release", "post", f"title {i}")
            for i in range(HOT)]
    rows += [(None, f"slug-{i}", "post", f"t{i}") for i in range(800)]
    incoming = spark.createDataFrame(
        rows,
        "ID long, post_name string, post_type string, post_title string") \
        .select(F.col("ID").alias("post.ID"),
                F.col("post_name").alias("post.post_name"),
                F.col("post_type").alias("post.post_type"),
                F.col("post_title").alias("post.post_title")) \
        .repartition(16).localCheckpoint(eager=True)
    posts = spark.createDataFrame(
        [(i, f"existing-{i}", "post", f"old {i}") for i in range(1, 501)],
        "ID long, post_name string, post_type string, post_title string") \
        .localCheckpoint(eager=True)
    stage = post_upsert_stage()

    def act():
        st = stage({"incoming": incoming, "posts": posts})
        # Verify through ONE unfiltered aggregate over the journey
        # output: a `.where(post_name == hot)` inspection query would
        # recompute the whole plan with the hot slug as its ONLY key —
        # an all-rows-one-partition shape no journey stage ever runs —
        # and its stages would fail the bound for reasons the journey
        # doesn't have.  Map-side partial agg keeps this probe tiny.
        is_hot = F.col("`post.post_name`") == "hot-press-release"
        row = st["incoming"].agg(
            F.count(F.when(is_hot, 1)).alias("n_hot"),
            F.countDistinct(
                F.when(is_hot, F.col("`post.ID`"))).alias("n_ids")
        ).first()
        return st["posts"].count(), row.n_hot, row.n_ids

    with _large_dim_regime(spark):
        (n_posts, n_hot, n_hot_ids), stats = _probe_skew(spark, act)
    assert n_hot == HOT and n_hot_ids == 1     # one entity, found 9,999×
    assert n_posts == 500 + 800 + 1            # one row per distinct key
    # largest allowed per-task read: one 16-way input partition, or
    # one AQE skew-split chunk of the hot SMJ partition (advisory-
    # sized; generous ×4 headroom for compression variance) — never
    # the whole 10k hot key on one reducer
    _assert_bounded("post_upsert_hot_slug", stats,
                    abs_cap=HOT // 2)
    assert all(st["max"] < HOT for st in stats), \
        "a task swallowed the whole hot slug"


def test_training_shards_hot_corpus_bounded(spark, skew_docs, tmp_path):
    """The training_prep_all journey's write under the skewed corpus:
    shard membership is md5(id)-addressed, so the 10k mirrored docs
    scatter uniformly regardless of their shared content, and every
    shard-writer task reads ~N/n_shards rows — the designed unit of
    work. A content-keyed sharder would put all mirrors in one shard;
    this asserts the id-keyed one cannot."""
    from wp_etl_migration_spark.sinks.training import (
        write_training_shards)

    N_SHARDS = 8
    n = skew_docs.count()

    def act():
        return write_training_shards(
            skew_docs, str(tmp_path / "shards"), "doc_id",
            n_shards=N_SHARDS, salt="skewbed|")

    manifest, stats = _probe_skew(spark, act)
    assert manifest["n_rows"] == n
    per_shard = [v["rows"] for v in manifest["shards"].values()]
    assert len(per_shard) == N_SHARDS
    fair = n / N_SHARDS
    assert max(per_shard) <= 1.25 * fair, \
        f"hot content concentrated a shard: {per_shard}"
    assert min(per_shard) >= 0.75 * fair
    # shard-keyed exchanges: per-task rows ~ one shard's fair share
    _assert_bounded("write_training_shards", stats,
                    abs_cap=int(1.25 * fair) + SKEW_SLACK)
