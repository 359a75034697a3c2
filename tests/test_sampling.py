"""Deterministic hash sampling (operators/sampling.py) and Gopher
quality rules (operators/textstats.py gopher_rules)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.sampling import (
    hash_sample, stratified_hash_sample)
from wp_etl_migration_spark.operators.textstats import gopher_rules


def test_hash_sample_deterministic_and_proportional(spark):
    df = spark.range(4000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in hash_sample(df, "k", 0.3).collect())
    b = sorted(r.k for r in hash_sample(df, "k", 0.3).collect())
    assert a == b  # same run-to-run
    assert 0.25 < len(a) / 4000 < 0.35  # ~fraction


def test_hash_sample_nested_fractions(spark):
    # A smaller fraction with the same salt is a subset of a larger one
    # (threshold construction) — lets pipelines grow samples monotonically.
    df = spark.range(2000).withColumnRenamed("id", "k")
    small = {r.k for r in hash_sample(df, "k", 0.1).collect()}
    big = {r.k for r in hash_sample(df, "k", 0.4).collect()}
    assert small <= big


def test_hash_sample_salts_independent(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = {r.k for r in hash_sample(df, "k", 0.5, salt="x").collect()}
    b = {r.k for r in hash_sample(df, "k", 0.5, salt="y").collect()}
    overlap = len(a & b) / 2000
    assert 0.15 < overlap < 0.35  # ≈0.25 if independent, not 0.5


def test_hash_sample_fraction_bounds(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)
    assert hash_sample(df, "k", 1.0).count() == 10
    assert hash_sample(df, "k", 0.0).count() == 0


def test_stratified_hash_sample(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(1000)],
        ["k", "lang"])
    out = stratified_hash_sample(df, "k", "lang",
                                 {"en": 1.0}, default=0.0).collect()
    assert all(r.lang == "en" for r in out) and len(out) == 500


def test_pack_sequences_layout(spark):
    from wp_etl_migration_spark.operators.packing import pack_sequences
    df = spark.createDataFrame(
        [(1, 6), (2, 3), (3, 5), (4, 10)], ["doc_id", "n"])
    got = {r.doc_id: (r.bin_id, r.bin_offset) for r in
           pack_sequences(df, "doc_id", "n", seq_len=8).collect()}
    # cumsum-before: 0, 6, 9, 14 with seq_len 8:
    # doc1 starts bin0@0; doc2 bin0@6 (spans); doc3 bin1@1; doc4 bin1@6.
    assert got == {1: (0, 0), 2: (0, 6), 3: (1, 1), 4: (1, 6)}


def test_pack_sequences_bad_seq_len(spark):
    from wp_etl_migration_spark.operators.packing import pack_sequences
    df = spark.createDataFrame([(1, 2)], ["doc_id", "n"])
    import pytest as _pt
    with _pt.raises(ValueError):
        pack_sequences(df, "doc_id", "n", seq_len=0)


def test_gopher_rules_flags(spark):
    good = ("the quick brown fox jumps over the lazy dog and that dog "
            "can have quite a day with all of this running around town")
    bullets = "- one\n- two\n- three"
    symbols = "# " * 30
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols)], ["doc_id", "text"])
    rows = {r.doc_id: r for r in
            df.select("doc_id",
                      gopher_rules("text", min_words=10).alias("r"))
            .select("doc_id", "r.*").collect()}
    assert rows[1].passes
    assert not rows[2].bullet_ratio_ok and not rows[2].passes
    assert not rows[3].symbol_ratio_ok and not rows[3].passes


def test_weighted_hash_sample_monotone_and_clamped(spark):
    from wp_etl_migration_spark.operators.sampling import (
        weighted_hash_sample)
    from pyspark.sql import functions as F
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    def kept(w):
        return weighted_hash_sample(
            df.withColumn("w", F.lit(w)), "doc_id", "w").count()
    # weight 0 keeps nothing, 1 keeps everything, mid is monotone.
    assert kept(0.0) == 0
    assert kept(1.0) == 4000
    lo, hi = kept(0.2), kept(0.8)
    assert 0 < lo < hi < 4000
    # out-of-range weights clamp, not explode
    assert kept(7.5) == 4000 and kept(-3.0) == 0
    # determinism: same inputs → identical keep set
    a = {r.doc_id for r in weighted_hash_sample(
        df.withColumn("w", F.lit(0.5)), "doc_id", "w").collect()}
    b = {r.doc_id for r in weighted_hash_sample(
        df.repartition(7).withColumn("w", F.lit(0.5)), "doc_id",
        "w").collect()}
    assert a == b


def test_shared_gram_stats_tags_duplicated_passages(spark):
    from wp_etl_migration_spark.operators.textstats import (
        shared_gram_stats)
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, shared + " unique tail one"),
         (2, shared + " different ending words here"),
         (3, "totally fresh content with no overlap at all ok")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in
           shared_gram_stats(docs, "doc_id", "text", k=8).collect()}
    # docs 1 and 2 share exactly the leading 8-gram; doc 3 shares none
    assert got[1].n_dup_grams == 1 and got[2].n_dup_grams == 1
    assert got[3].n_dup_grams == 0 and got[3].dup_fraction == 0.0
    assert 0 < got[1].dup_fraction < 1
    # identical docs: every gram start duplicated -> fraction 1.0
    twins = spark.createDataFrame(
        [(1, shared + " x y z"), (2, shared + " x y z")],
        ["doc_id", "text"])
    out = shared_gram_stats(twins, "doc_id", "text", k=8).collect()
    assert all(r.dup_fraction == 1.0 for r in out)


def test_global_shuffle_deterministic_permutation(spark):
    from wp_etl_migration_spark.operators.sampling import global_shuffle
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = global_shuffle(df, "k", 8, salt="s").collect()
    b = global_shuffle(df, "k", 8, salt="s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # every row placed exactly once; positions dense 1..len within shard
    shards = {}
    for r in a:
        shards.setdefault(r.shard, []).append(r.pos)
    assert sum(len(v) for v in shards.values()) == 1000
    assert set(shards) <= set(range(8))
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # roughly balanced (uniform hash): no shard over 2x the mean
    assert max(len(v) for v in shards.values()) < 2 * (1000 / 8)
    # a different salt draws a different permutation
    c = global_shuffle(df, "k", 8, salt="t").collect()
    assert {(r.k, r.shard, r.pos) for r in c} != {
        (r.k, r.shard, r.pos) for r in a}
    # repartitioning the input must not change the assignment
    d = global_shuffle(df.repartition(13), "k", 8, salt="s").collect()
    assert sorted(map(tuple, d)) == sorted(map(tuple, a))


def test_global_shuffle_bad_shards(spark):
    from wp_etl_migration_spark.operators.sampling import global_shuffle
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        global_shuffle(df, "k", 0)


def test_vocab_build_rank_and_coverage(spark):
    from wp_etl_migration_spark.operators.textstats import vocab_build
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], ["doc_id", "text"])
    # counts: a=4, b=3, c=1, d=1 (total 9); ties rank alphabetically
    got = {r.rank: r for r in vocab_build(df, "text", top_k=3).collect()}
    assert [got[i].token for i in (1, 2, 3)] == ["a", "b", "c"]
    assert got[1].n == 4 and got[2].n == 3 and got[3].n == 1
    assert got[1].cum_share == 4 / 9
    assert got[2].cum_share == 7 / 9
    assert got[3].cum_share == 8 / 9


def test_vocab_build_topk_is_distributed(spark):
    """The global top-k must plan as TakeOrderedAndProject (per-
    partition partial top-k) — never a full-vocabulary sort feeding an
    unpartitioned window, which would funnel ~1e8 rows at 100 TB
    through one task."""
    from wp_etl_migration_spark.operators.textstats import vocab_build
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], ["doc_id", "text"])
    plan = vocab_build(df, "text", top_k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_remove_shared_passages_cuts_duplicated_span(spark):
    """A 4-gram copied between two docs is cut from both; the unique
    remainder survives in order; untouched docs pass through."""
    from wp_etl_migration_spark.operators.textstats import (
        remove_shared_passages)
    span = "copy this exact span"
    df = spark.createDataFrame(
        [(1, f"intro words here {span} outro one"),
         (2, f"different opening {span} other ending"),
         (3, "entirely original content nothing shared")],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in remove_shared_passages(
        df, "doc_id", "text", k=4).collect()}
    assert got[1].text == "intro words here outro one"
    assert got[1].n_tokens == 9 and got[1].n_removed_tokens == 4
    assert got[2].text == "different opening other ending"
    assert got[3].text == "entirely original content nothing shared"
    assert got[3].n_removed_tokens == 0


def test_remove_shared_passages_overlapping_grams_merge(spark):
    """Overlapping shared grams cover a longer span exactly once; a doc
    that is entirely duplicated keeps empty text."""
    from wp_etl_migration_spark.operators.textstats import (
        remove_shared_passages)
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"])
    got = {r.doc_id: r for r in remove_shared_passages(
        df, "doc_id", "text", k=4).collect()}
    assert got[1].text == "" and got[1].n_removed_tokens == 6
    assert got[2].text == "" and got[2].n_removed_tokens == 6


def test_chunk_documents_windows_and_overlap(spark):
    from wp_etl_migration_spark.operators.textstats import chunk_documents
    import pytest as _pt
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "short one"), (3, "")],
                               ["doc_id", "text"])
    got = {}
    for r in chunk_documents(df, "doc_id", "text", chunk_tokens=8,
                             overlap=4).collect():
        got.setdefault(r.doc_id, {})[r.chunk_id] = (r.chunk_text,
                                                    r.n_tokens)
    # 10 tokens, window 8, step 4: starts at 1 and 5 only (a start at
    # 9 would be fully covered by chunk 1)
    assert got[1][0] == (" ".join(f"w{i}" for i in range(8)), 8)
    assert got[1][1] == (" ".join(f"w{i}" for i in range(4, 10)), 6)
    assert len(got[1]) == 2
    # short and empty docs: exactly one chunk each
    assert got[2] == {0: ("short one", 2)}
    assert len(got[3]) == 1
    # every token position covered, in order, when re-concatenated
    # with overlap removed
    c0, c1 = got[1][0][0].split(), got[1][1][0].split()
    assert c0 + c1[4:] == text.split()
    with _pt.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_extract_keywords_rank_and_stopword_cut(spark):
    from wp_etl_migration_spark.operators.textstats import extract_keywords
    df = spark.createDataFrame(
        [(1, "the the the spark spark shuffle"),
         (2, "the the pandas pandas pandas arrow"),
         (3, "the arrow arrow")],
        ["doc_id", "text"])
    got = {}
    for r in extract_keywords(df, "doc_id", "text", top_k=2,
                              max_doc_freq_share=0.9).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.token, r.tf, r.df))
    for v in got.values():
        v.sort()
    # 'the' is in 3/3 docs > 0.9 share -> excluded everywhere
    assert all(t != "the" for v in got.values() for _, t, _, _ in v)
    # doc 1: spark tf=2 beats shuffle tf=1
    assert got[1] == [(1, "spark", 2, 1), (2, "shuffle", 1, 1)]
    # doc 2: pandas tf=3; arrow tf=1
    assert got[2][0] == (1, "pandas", 3, 1)
    # doc 3: arrow tf=2 (df=2)
    assert got[3][0] == (1, "arrow", 2, 2)


def test_assign_splits_disjoint_exhaustive_deterministic(spark):
    from wp_etl_migration_spark.operators.sampling import assign_splits
    df = spark.range(3000).withColumnRenamed("id", "k")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = assign_splits(df, "k", fr, salt="s").collect()
    # exhaustive: every row assigned
    assert len(a) == 3000 and all(r.split in fr for r in a)
    # roughly proportional
    from collections import Counter
    c = Counter(r.split for r in a)
    assert 0.75 < c["train"] / 3000 < 0.85
    assert 0.06 < c["val"] / 3000 < 0.14
    # deterministic + partition-invariant
    b = assign_splits(df.repartition(17), "k", fr, salt="s").collect()
    assert sorted((r.k, r.split) for r in a) == \
        sorted((r.k, r.split) for r in b)
    # a grown corpus never reassigns existing rows
    grown = assign_splits(
        spark.range(6000).withColumnRenamed("id", "k"), "k", fr,
        salt="s").collect()
    gmap = {r.k: r.split for r in grown}
    assert all(gmap[r.k] == r.split for r in a)
    import pytest as _pt
    with _pt.raises(ValueError):
        assign_splits(df, "k", {"train": 0.8, "val": 0.1})


def test_null_key_behavior_pinned(spark):
    """NULL keys: samplers drop, global_shuffle gives a NULL shard,
    assign_splits falls to the last sorted-name split (documented in
    the module docstring — this test pins it against drift)."""
    from wp_etl_migration_spark.operators.sampling import (
        assign_splits, global_shuffle, hash_sample)
    df = spark.createDataFrame([(1,), (None,)], "k long")
    assert [r.k for r in hash_sample(df, "k", 1.0).collect()] == [1]
    sh = {r.k: r.shard for r in global_shuffle(df, "k", 4).collect()}
    assert sh[1] is not None and sh[None] is None
    sp = {r.k: r.split for r in assign_splits(
        df, "k", {"train": 0.9, "val": 0.1}).collect()}
    assert sp[None] == "val"  # last in sorted-name order


def test_mix_corpora_proportions_and_determinism(spark):
    from wp_etl_migration_spark.operators.sampling import mix_corpora
    import pytest as _pt
    web = spark.range(8000).selectExpr("id AS doc_id")
    code = spark.range(1000).selectExpr("id + 100000 AS doc_id")
    srcs = {"web": web, "code": code}
    props = {"web": 0.75, "code": 0.25}
    mixed = mix_corpora(srcs, "doc_id", props, salt="mix1")
    from collections import Counter
    rows = mixed.collect()
    c = Counter(r.mix_source for r in rows)
    # code is binding (1000/0.25 = 4000 target): kept ~whole; web
    # downsampled to ~3000. Hash sampling is approximate: ±10%.
    assert c["code"] == 1000                     # frac 1.0 -> exact
    assert 0.9 * 3000 < c["web"] < 1.1 * 3000
    share = c["web"] / (c["web"] + c["code"])
    assert 0.70 < share < 0.80
    # deterministic: same call -> identical rows
    again = mix_corpora(srcs, "doc_id", props, salt="mix1").collect()
    assert sorted((r.doc_id, r.mix_source) for r in rows) == \
        sorted((r.doc_id, r.mix_source) for r in again)
    # growing a source lowers its fraction; the nested-threshold
    # construction sheds rows deterministically: among the ORIGINAL
    # ids, the new kept set is a subset of the old one
    web2 = spark.range(12000).selectExpr("id AS doc_id")
    grown = mix_corpora({"web": web2, "code": code}, "doc_id", props,
                        salt="mix1").collect()
    kept_before = {r.doc_id for r in rows if r.mix_source == "web"}
    kept_after = {r.doc_id for r in grown
                  if r.mix_source == "web" and r.doc_id < 8000}
    assert kept_after <= kept_before
    with _pt.raises(ValueError, match="sum to 1"):
        mix_corpora(srcs, "doc_id", {"web": 0.5, "code": 0.25})
    with _pt.raises(ValueError, match="same corpora"):
        mix_corpora(srcs, "doc_id", {"web": 1.0})


def test_cap_per_key_domain_caps(spark):
    """Per-key cap: at most n rows survive per key, chosen
    deterministically (content-addressed draw) or quality-ranked via
    order_col; NULL keys form their own capped group."""
    from wp_etl_migration_spark.operators.sampling import cap_per_key
    import pytest as _pt
    rows = [(i, "a", float(i)) for i in range(10)] + \
           [(100 + i, "b", float(i)) for i in range(3)] + \
           [(200 + i, None, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                               "q double")
    got = cap_per_key(df, "doc_id", "source", 2).collect()
    from collections import Counter
    c = Counter(r.source for r in got)
    assert c == {"a": 2, "b": 2, None: 2}
    # deterministic: identical kept set on a re-run and a repartition
    again = cap_per_key(df.repartition(7), "doc_id", "source", 2) \
        .collect()
    assert sorted(r.doc_id for r in got) == \
        sorted(r.doc_id for r in again)
    # quality-ranked: keep the BEST n per key (highest q, id tiebreak)
    best = cap_per_key(df, "doc_id", "source", 2, order_col="q")
    ids = sorted(r.doc_id for r in best.collect())
    assert ids == [8, 9, 101, 102, 202, 203]
    # a cap larger than every group is the identity
    assert cap_per_key(df, "doc_id", "source", 99).count() == len(rows)
    with _pt.raises(ValueError, match=">= 1"):
        cap_per_key(df, "doc_id", "source", 0)


def test_mix_corpora_zero_proportion_excludes_source(spark):
    """A 0.0 proportion disables a source (no ZeroDivisionError, no
    rows, no n_out constraint); negatives are rejected outright."""
    from wp_etl_migration_spark.operators.sampling import mix_corpora
    import pytest as _pt
    web = spark.range(2000).selectExpr("id AS doc_id")
    code = spark.range(500).selectExpr("id + 100000 AS doc_id")
    srcs = {"web": web, "code": code}
    mixed = mix_corpora(srcs, "doc_id", {"web": 1.0, "code": 0.0},
                        salt="z")
    got = mixed.collect()
    assert {r.mix_source for r in got} == {"web"}
    assert len(got) == 2000                      # frac 1.0 -> whole
    with _pt.raises(ValueError, match=">= 0"):
        mix_corpora(srcs, "doc_id", {"web": 1.5, "code": -0.5})


def test_quantile_band_filter_trims_tails_per_group(spark):
    from wp_etl_migration_spark.operators.sampling import (
        quantile_band_filter)
    import pytest as _pt
    rows = [(i, "a", float(i)) for i in range(10)] + \
           [(100 + i, "b", float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "score"])
    # keep the middle (0.2, 0.8] of each group by rank fraction
    got = sorted(r.doc_id for r in quantile_band_filter(
        df, "doc_id", "score", lo=0.2, hi=0.8,
        group_col="src").collect())
    # group a (10 rows): fracs .1.. keep (.2, .8] -> ranks 3..8 ->
    #   scores 2..7 (ids 2..7)
    # group b (4 rows): fracs .25 .5 .75 1.0 -> keep .25 .5 .75
    #   -> ids 100,101,102
    assert got == [2, 3, 4, 5, 6, 7, 100, 101, 102]
    # whole-frame mode + bounds validation
    allkept = quantile_band_filter(df, "doc_id", "score").count()
    assert allkept == 14
    with _pt.raises(ValueError):
        quantile_band_filter(df, "doc_id", "score", lo=0.5, hi=0.4)


def test_quantile_band_filter_drops_null_scores(spark):
    from wp_etl_migration_spark.operators.sampling import (
        quantile_band_filter)
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, None), (4, 3.0), (5, 4.0)],
        "doc_id long, score double")
    got = sorted(r.doc_id for r in quantile_band_filter(
        df, "doc_id", "score", lo=0.25, hi=1.0).collect())
    # null row dropped AND excluded from n: 4 ranked rows, keep
    # fracs (.25, 1] -> ranks 2,3,4 -> ids 2,4,5
    assert got == [2, 4, 5]


def test_script_fractions_multilingual(spark):
    from wp_etl_migration_spark.operators.textstats import script_fractions
    df = spark.createDataFrame(
        [(1, "Hello world"),                  # pure latin
         (2, "Привет мир"),                   # pure cyrillic
         (3, "Hello Привет 你好 مرحبا"),       # script soup
         (4, "12345 !!!")],                   # no letters
        ["doc_id", "text"])
    got = {r.doc_id: r.s.asDict() for r in df.select(
        "doc_id", script_fractions("text").alias("s")).collect()}
    assert got[1]["latin"] == 1.0 and got[1]["cyrillic"] == 0.0
    assert got[2]["cyrillic"] == 1.0
    s = got[3]
    assert 0 < s["latin"] < 1 and 0 < s["cyrillic"] < 1
    assert 0 < s["han"] < 1 and 0 < s["arabic"] < 1
    assert abs(s["latin"] + s["cyrillic"] + s["han"] + s["arabic"]
               + s["devanagari"] + s["other"] - 1.0) < 1e-12
    assert got[4]["n_letters"] == 0 and got[4]["latin"] == 0.0


def test_select_token_budget_global(spark):
    """Priority-ordered take-until-budget: rows keep while the
    cumulative tokens BEFORE them are under budget (first row always
    kept; overshoot < one doc); NULL priorities fill last, NULL token
    counts are zero-length."""
    from wp_etl_migration_spark.operators.sampling import (
        select_token_budget)
    df = spark.createDataFrame(
        [(1, 40, 0.9), (2, 40, 0.8), (3, 40, 0.7), (4, 40, None),
         (5, None, 0.95)],
        "doc_id long, n int, q double")
    got = {r.doc_id: (r.n_tokens, r.cum_tokens) for r in
           select_token_budget(df, "doc_id", "n", 100,
                               priority_col="q").collect()}
    # order: 5 (0.95, 0 tokens), 1, 2, 3, then NULL-priority 4
    assert got == {5: (0, 0), 1: (40, 40), 2: (40, 80),
                   3: (40, 120)}          # 3 kept: before=80 < 100
    # a single over-budget doc still keeps the first row
    one = select_token_budget(df.where("doc_id = 1"), "doc_id", "n",
                              10, priority_col="q").collect()
    assert [(r.doc_id, r.cum_tokens) for r in one] == [(1, 40)]
    # budget 0 would select nothing under the strictly-before rule,
    # contradicting the documented first-row progress guarantee — it
    # is rejected loudly (ADVICE r9)
    with pytest.raises(ValueError, match="budget must be >= 1"):
        select_token_budget(df, "doc_id", "n", 0, priority_col="q")


def test_select_token_budget_matches_single_window(spark):
    """The two-phase global prefix sum equals the one-window form on
    a larger shuffled input (the pack_sequences equivalence, replayed
    for the selection operator)."""
    from pyspark.sql import Window

    from wp_etl_migration_spark.operators.sampling import (
        select_token_budget)
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(50)) + 1).alias("n"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000))
        .cast("double").alias("q")).repartition(13)
    budget = 3000
    got = {(r.doc_id, r.cum_tokens) for r in
           select_token_budget(df, "doc_id", "n", budget,
                               priority_col="q").collect()}
    w = (Window.orderBy(F.col("q").desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, -1))
    ref = {(r.doc_id, r.cum) for r in
           df.withColumn("__b", F.coalesce(F.sum("n").over(w),
                                           F.lit(0)))
           .where(F.col("__b") < budget)
           .select("doc_id", (F.col("__b") + F.col("n")).alias("cum"))
           .collect()}
    assert got == ref and len(got) > 50


def test_select_token_budget_per_key(spark):
    """per_key mode: every key gets its own budget (token-weighted
    domain cap), selections independent and parallel."""
    from wp_etl_migration_spark.operators.sampling import (
        select_token_budget)
    df = spark.createDataFrame(
        [(1, "a", 60, 3.0), (2, "a", 60, 2.0), (3, "a", 60, 1.0),
         (4, "b", 10, 1.0), (5, "b", 10, 2.0)],
        "doc_id long, dom string, n int, q double")
    got = {r.doc_id: r.cum_tokens for r in
           select_token_budget(df, "doc_id", "n", 100,
                               priority_col="q",
                               per_key="dom").collect()}
    # a: 1 (60), 2 (before=60 < 100 -> kept, cum 120), 3 dropped
    # b: both fit
    assert got == {1: 60, 2: 120, 5: 10, 4: 20}
