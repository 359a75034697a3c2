"""Bigram language-model quality scoring (operators/lm.py)."""

from __future__ import annotations

import math

from wp_etl_migration_spark.operators.lm import bigram_counts, lm_score


def test_bigram_counts_and_conditionals(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], ["doc_id", "text"])
    lm = {(r.w1, r.w2): (r.n, r.n_w1)
          for r in bigram_counts(ref, "text").collect()}
    # "the cat" twice; left-context total for "the" is 2
    assert lm[("the", "cat")] == (2, 2)
    # "cat sat"/"cat ran" once each; context total for "cat" is 2
    assert lm[("cat", "sat")] == (1, 2) and lm[("cat", "ran")] == (1, 2)


def test_bigram_counts_min_count_keeps_calibration(spark):
    ref = spark.createDataFrame(
        [(1, "a b a b a c")], ["doc_id", "text"])
    pruned = {(r.w1, r.w2): (r.n, r.n_w1)
              for r in bigram_counts(ref, "text", min_count=2).collect()}
    # "a c" (n=1) pruned, but "a b"'s context total still counts it
    assert ("a", "c") not in pruned
    assert pruned[("a", "b")] == (2, 3)


def test_lm_score_hit_rate_and_logprob(spark):
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], ["doc_id", "text"])
    lm = bigram_counts(ref, "text")
    docs = spark.createDataFrame(
        [(10, "the cat sat"),        # all 2 bigrams known
         (11, "the dog sat"),        # only... "the dog"/"dog sat" unknown
         (12, "zq")],                # < 2 tokens: no row at all
        ["doc_id", "text"])
    got = {r.doc_id: r for r in lm_score(docs, lm, "doc_id",
                                         "text").collect()}
    assert set(got) == {10, 11}
    assert got[10].n_bigrams == 2 and got[10].n_hits == 2
    assert got[10].hit_rate == 1.0
    # P(cat|the)=1, P(sat|cat)=1/2 -> mean logprob = ln(0.5)/2
    assert abs(got[10].avg_logprob - math.log(0.5) / 2) < 1e-12
    assert got[11].n_hits == 0 and got[11].hit_rate == 0.0
    assert got[11].avg_logprob is None


def test_lm_score_in_corpus_self_scoring(spark):
    """CCNet shape: score a crawl against an LM built from a trusted
    subset — fluent docs (in-domain bigrams) outrank keyboard mash."""
    trusted = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog")
         for i in range(5)], ["doc_id", "text"])
    crawl = spark.createDataFrame(
        [(100, "the quick brown fox jumps"),
         (101, "zxcv qwer asdf zxcv poiu")], ["doc_id", "text"])
    got = {r.doc_id: r for r in
           lm_score(crawl, bigram_counts(trusted, "text"), "doc_id",
                    "text").collect()}
    assert got[100].hit_rate > got[101].hit_rate
    assert got[101].n_hits == 0


def test_ngram_counts_trigram_conditionals(spark):
    from wp_etl_migration_spark.operators.lm import ngram_counts
    ref = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a b c")], ["doc_id", "text"])
    lm = {(r.ctx, r.w): (r.n_gram, r.n_ctx)
          for r in ngram_counts(ref, "text", n=3).collect()}
    assert lm[("a b", "c")] == (2, 3)
    assert lm[("a b", "d")] == (1, 3)
    import pytest as _pt
    with _pt.raises(ValueError):
        ngram_counts(ref, "text", n=1)


def test_lm_score_ngram_matches_bigram_at_n2(spark):
    """The generalized scorer at n=2 produces the same deterministic
    columns as the dedicated bigram path on the same data."""
    from wp_etl_migration_spark.operators.lm import (
        bigram_counts, lm_score, lm_score_ngram, ngram_counts)
    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(10, "the cat sat on a mat"), (11, "dog gone")],
        ["doc_id", "text"])
    via_bigram = {r.doc_id: (r.n_bigrams, r.n_hits, r.hit_rate)
                  for r in lm_score(docs, bigram_counts(ref, "text"),
                                    "doc_id", "text").collect()}
    via_ngram = {r.doc_id: (r.n_ngrams, r.n_hits, r.hit_rate)
                 for r in lm_score_ngram(docs, ngram_counts(ref, "text",
                                                            n=2),
                                         "doc_id", "text",
                                         n=2).collect()}
    assert via_bigram == via_ngram


def test_lm_score_trigram_sharper_than_bigram(spark):
    """Higher order = stricter context: a doc reusing words in a new
    ORDER keeps bigram hits but loses trigram hits."""
    from wp_etl_migration_spark.operators.lm import (
        lm_score_ngram, ngram_counts)
    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(10, "the quick brown fox"),          # verbatim prefix
         (11, "brown the fox quick jumps")],   # shuffled words
        ["doc_id", "text"])
    tri = {r.doc_id: r.hit_rate for r in lm_score_ngram(
        docs, ngram_counts(ref, "text", n=3), "doc_id", "text",
        n=3).collect()}
    assert tri[10] == 1.0 and tri[11] == 0.0


def test_prune_modes_same_survivors_different_totals(spark):
    """VERDICT r8 #4: pre_total pruning filters the first
    aggregation's output BEFORE the context-totals shuffle and join —
    same surviving (ctx, w) set as post_total, but n_ctx renormalizes
    over survivors (the standard count-pruned-LM semantics) instead
    of staying calibrated to the full corpus."""
    import pytest as _pt

    from wp_etl_migration_spark.operators.lm import (
        bigram_counts, ngram_counts)
    ref = spark.createDataFrame(
        [(1, "a b a b a c")], ["doc_id", "text"])
    post = {(r.w1, r.w2): (r.n, r.n_w1)
            for r in bigram_counts(ref, "text", min_count=2,
                                   prune="post_total").collect()}
    pre = {(r.w1, r.w2): (r.n, r.n_w1)
           for r in bigram_counts(ref, "text", min_count=2,
                                  prune="pre_total").collect()}
    assert set(post) == set(pre) == {("a", "b"), ("b", "a")}
    # calibrated: "a"'s total still counts the pruned "a c"
    assert post[("a", "b")] == (2, 3)
    # renormalized: only survivors contribute to the context total
    assert pre[("a", "b")] == (2, 2)
    # same matrix on the generalized n-gram path
    ref3 = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z"), (3, "x y w")], ["doc_id", "text"])
    post3 = {(r.ctx, r.w): (r.n_gram, r.n_ctx)
             for r in ngram_counts(ref3, "text", n=3, min_count=2,
                                   prune="post_total").collect()}
    pre3 = {(r.ctx, r.w): (r.n_gram, r.n_ctx)
            for r in ngram_counts(ref3, "text", n=3, min_count=2,
                                  prune="pre_total").collect()}
    assert post3 == {("x y", "z"): (2, 3)}
    assert pre3 == {("x y", "z"): (2, 2)}
    with _pt.raises(ValueError):
        ngram_counts(ref3, "text", n=3, prune="partial")


def test_pre_total_prune_cuts_join_width(spark):
    """The point of pre_total: the totals aggregation and the
    counts⋈totals join must sit ABOVE the min_count filter in the
    plan (pruned width), not below it."""
    from wp_etl_migration_spark.operators.lm import ngram_counts
    ref = spark.createDataFrame(
        [(i, f"a b c{i % 3} d{i}") for i in range(20)],
        ["doc_id", "text"])
    pre = ngram_counts(ref, "text", n=3, min_count=2,
                       prune="pre_total")
    plan = pre._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in plan
    # behavioral check: the surviving set is min_count-filtered and
    # totals equal the sum of surviving counts per context
    rows = pre.collect()
    assert all(r.n_gram >= 2 for r in rows)
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r.ctx, [0, None])
        by_ctx[r.ctx][0] += r.n_gram
        by_ctx[r.ctx][1] = r.n_ctx
    for ctx, (s, tot) in by_ctx.items():
        assert s == tot, (ctx, s, tot)
