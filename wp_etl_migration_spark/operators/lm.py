"""N-gram language-model quality scoring (LLM-pipeline extension; no
counterpart in the reference).

The CCNet recipe (Wenzek et al. 2020, public) scores crawl documents
with a language model trained on a trusted corpus and keeps the
low-perplexity tail — the single most used quality signal in public
pretraining pipelines (CCNet, RedPajama, FineWeb all apply a variant).
Real deployments use KenLM; this module implements the same shape
engine-natively: a bigram LM built with two aggregations, scored with
one join — all built-in Column expressions, no UDFs.

Scale design: the LM build is two groupBy shuffles over (w1, w2) /
(w1,) keys — uniform token distribution aside from stopword heads,
which map-side partial aggregation absorbs (counts combine before the
shuffle; the hot key arrives pre-reduced, one row per map task). The
scoring join keys on the same uniform bigram; a pruned LM
(``min_count``) is usually broadcast-sized even when the training
corpus is not (vocabulary grows ~O(corpus^0.5), Heaps' law), and AQE
picks the broadcast automatically.

Determinism note: ``hit_rate`` / ``oov_rate`` are single divisions of
exact BIGINT aggregates — bit-identical on any engine (the oracle
contract). ``avg_logprob`` is a sum of per-row ``ln`` results, whose
last-ulp rounding and summation order are engine-specific; it's the
operationally useful perplexity signal but is NOT oracle-hashable, so
parity queries project the integer/raio columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(df: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """Explode word bigrams: (*keep_cols, w1, w2). Same codegen-friendly
    slice+zip generator as operators.dedup.shingles (no UDF)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    cnt = F.size("__toks") - 1
    z = F.arrays_zip(F.slice("__toks", 1, cnt), F.slice("__toks", 2, cnt))
    return (df.select(*[F.col(c) for c in keep_cols],
                      toks.alias("__toks"))
            .where(F.size("__toks") >= 2)
            .select(*[F.col(c) for c in keep_cols],
                    F.explode(z).alias("__g"))
            .select(*[F.col(c) for c in keep_cols],
                    F.col("__g")["0"].alias("w1"),
                    F.col("__g")["1"].alias("w2")))


def bigram_counts(df: DataFrame, text_col: str,
                  min_count: int = 1,
                  prune: str = "post_total") -> DataFrame:
    """Train the bigram LM: (w1, w2, n, n_w1) — bigram count and
    left-context total, the two numbers P(w2|w1) = n/n_w1 needs.

    ``min_count`` prunes rare bigrams; ``prune`` picks WHERE
    (VERDICT r8 #4):

    - ``"post_total"`` (default): context totals are taken over the
      FULL corpus, then rare bigrams drop — probabilities stay
      calibrated against everything seen, but the totals aggregation
      and the counts⋈totals join run at full vocabulary width.
    - ``"pre_total"``: the ``n >= min_count`` filter runs straight
      after the first aggregation, so the totals shuffle and the join
      only carry the SURVIVING bigrams — on Zipf-shaped text the
      singleton tail is most of the distinct keys, so this is the
      cheap build. Probabilities renormalize over survivors (the
      standard count-pruned-LM semantics). Both modes keep the same
      surviving (w1, w2) set; only ``n_w1`` differs.

    Either way the filter is on FINAL counts — filtering map-side
    partial counts would cut the first shuffle too but makes the
    result depend on the physical partitioning (a pair can clear
    ``min_count`` globally while every partial stays under it), which
    no SQL oracle can reproduce; rejected.

    One wide groupBy, then the context total as a window SUM over the
    count frame (r14: the former ``counts ⋈ totals`` self-join
    duplicated the whole scan→explode→aggregate subtree in the
    physical plan — an isnotnull filter pushed into only the probe
    branch defeats ReusedExchange — so the corpus was tokenized and
    shuffled twice; the window computes the identical exact BIGINT
    total in one branch: one scan, one (w1,w2) exchange, one w1
    exchange, no join). Window state per partition key is one running
    sum over the ≤vocab-width rows of a single context — no skew a
    Zipf head can create that the count frame didn't already bound.
    """
    if prune not in ("post_total", "pre_total"):
        raise ValueError("prune must be 'post_total' or 'pre_total'")
    from pyspark.sql import Window
    bg = _bigrams(df, text_col)
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    if min_count > 1 and prune == "pre_total":
        counts = counts.where(F.col("n") >= min_count)
    out = counts.withColumn(
        "n_w1", F.sum("n").over(Window.partitionBy("w1")))
    if min_count > 1 and prune == "post_total":
        out = out.where(F.col("n") >= min_count)
    return out.select("w1", "w2",
                      F.col("n").cast("long").alias("n"),
                      F.col("n_w1").cast("long").alias("n_w1"))


def _ngrams(df: DataFrame, text_col: str, n: int,
            *keep_cols: str) -> DataFrame:
    """Explode word n-grams as (ctx, w): ctx = the n−1 preceding tokens
    space-joined, w = the predicted token. Same codegen slice+zip
    generator as :func:`_bigrams` (which is the n=2 special case)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    cnt = F.size("__toks") - (n - 1)
    z = F.arrays_zip(*[F.slice("__toks", i + 1, cnt) for i in range(n)])
    ctx = F.concat_ws(" ", *[F.col("__g")[str(i)] for i in range(n - 1)])
    return (df.select(*[F.col(c) for c in keep_cols],
                      toks.alias("__toks"))
            .where(F.size("__toks") >= n)
            .select(*[F.col(c) for c in keep_cols],
                    F.explode(z).alias("__g"))
            .select(*[F.col(c) for c in keep_cols],
                    ctx.alias("ctx"),
                    F.col("__g")[str(n - 1)].alias("w")))


def ngram_counts(df: DataFrame, text_col: str, n: int = 3,
                 min_count: int = 1,
                 prune: str = "post_total") -> DataFrame:
    """Train an order-``n`` LM: (ctx, w, n_gram, n_ctx) — the CCNet
    recipe uses 5-grams; :func:`bigram_counts` is the n=2 shape with
    split context columns, and its docstring explains the
    ``min_count`` × ``prune`` matrix: ``"pre_total"`` filters the
    first aggregation's output before the context totals, so the
    totals window only carries surviving n-grams (the cheap build on
    Zipf text, where singletons dominate the distinct keys — measured
    on the diversified corpus in BASELINE.md §r9); ``"post_total"``
    (default) keeps totals calibrated over the full corpus. The
    filter is always on FINAL counts — partial-count filtering would
    be partitioning-dependent and unoracleable. Context strings are
    (n−1)-token — larger shuffle keys, same uniform distribution.
    ``n_ctx`` is a window SUM over the count frame, not a
    counts⋈totals self-join — see :func:`bigram_counts` (r14: the
    join plan tokenized and shuffled the training corpus twice).
    """
    if n < 2:
        raise ValueError("n must be >= 2 (an order-1 LM has no context)")
    if prune not in ("post_total", "pre_total"):
        raise ValueError("prune must be 'post_total' or 'pre_total'")
    from pyspark.sql import Window
    g = _ngrams(df, text_col, n)
    counts = g.groupBy("ctx", "w").agg(F.count("*").alias("n_gram"))
    if min_count > 1 and prune == "pre_total":
        counts = counts.where(F.col("n_gram") >= min_count)
    out = counts.withColumn(
        "n_ctx", F.sum("n_gram").over(Window.partitionBy("ctx")))
    if min_count > 1 and prune == "post_total":
        out = out.where(F.col("n_gram") >= min_count)
    return out.select("ctx", "w",
                      F.col("n_gram").cast("long").alias("n_gram"),
                      F.col("n_ctx").cast("long").alias("n_ctx"))


def lm_score_ngram(df: DataFrame, lm: DataFrame, id_col: str,
                   text_col: str, n: int) -> DataFrame:
    """Score documents against an order-``n`` LM (from
    :func:`ngram_counts`): same output contract as :func:`lm_score`
    — (id, n_ngrams, n_hits, hit_rate, avg_logprob) with the same
    determinism split (exact-integer hit columns, engine-float
    logprob). One left join on (ctx, w), one per-doc aggregation.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    g = _ngrams(df, text_col, n, id_col)
    scored = g.join(lm, ["ctx", "w"], "left")
    logp = F.log(F.col("n_gram").cast("double")
                 / F.col("n_ctx").cast("double"))
    return (scored.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_ngrams"),
                 F.count("n_gram").cast("long").alias("n_hits"),
                 F.avg(logp).alias("avg_logprob"))
            .select(F.col(id_col),
                    "n_ngrams", "n_hits",
                    (F.col("n_hits").cast("double")
                     / F.col("n_ngrams").cast("double"))
                    .alias("hit_rate"),
                    "avg_logprob"))


def lm_score(df: DataFrame, lm: DataFrame, id_col: str,
             text_col: str) -> DataFrame:
    """Score documents against a bigram LM (from :func:`bigram_counts`).

    Returns one row per document:
    - ``n_bigrams``  — bigram positions in the doc (BIGINT)
    - ``n_hits``     — positions whose bigram exists in the LM (BIGINT)
    - ``hit_rate``   — n_hits / n_bigrams (single exact division)
    - ``avg_logprob``— mean ln P(w2|w1) over hit positions (NULL when
      no position hits); the perplexity-filter signal. Engine-float —
      see module docstring.

    Execution: explode doc bigrams, LEFT join the LM on (w1, w2) —
    every position keeps a row so misses count — then one per-doc
    aggregation. Bigram keys are uniform; the LM side is the small one
    (broadcast under AQE when pruned).
    """
    bg = _bigrams(df, text_col, id_col)
    scored = bg.join(lm, ["w1", "w2"], "left")
    logp = F.log(F.col("n").cast("double") / F.col("n_w1").cast("double"))
    return (scored.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.count("n").cast("long").alias("n_hits"),
                 F.avg(logp).alias("avg_logprob"))
            .select(F.col(id_col),
                    "n_bigrams", "n_hits",
                    (F.col("n_hits").cast("double")
                     / F.col("n_bigrams").cast("double")).alias("hit_rate"),
                    "avg_logprob"))
