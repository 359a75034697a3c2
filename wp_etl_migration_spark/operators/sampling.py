"""Deterministic (hash-based) sampling for training-data pipelines
(LLM-pipeline extension; no counterpart in the reference).

``df.sample()``/``sampleBy()`` draw from Spark's per-partition RNG —
re-running the job, changing the partitioning, or re-reading the input
changes the sample. Data pipelines at corpus scale need samples that are
*reproducible and content-addressed*: whether a row is kept depends only
on its key, so retries, backfills, and incremental runs agree forever.
The standard construction: map md5(salt ∥ key) to a uniform 32-bit
integer and keep the row iff it falls below fraction·2³². Pure codegen
Column expressions, no shuffle, engine-portable (the DuckDB oracle
reproduces the exact same keep set via 0x-hex casts).

NULL keys: ``md5(salt ∥ NULL)`` is NULL, so a NULL bucket never
compares under any threshold — NULL-keyed rows are DROPPED by every
sampler here, get a NULL shard in :func:`global_shuffle`, and fall to
the last (sorted-name) split in :func:`assign_splits`. Keys are row
identities; a NULL one is upstream data breakage — filter or mint ids
first (the behavior is pinned by tests so it can't drift silently).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1 << 32


def hash_bucket(col: Column | str, salt: str = "") -> Column:
    """Uniform 32-bit bucket of md5(salt ∥ key) — the sampling datum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8),
        16, 10).cast("long")


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed on ``id_col``.

    Same key + same salt → same decision on any engine, any run, any
    partitioning. Different ``salt`` values draw independent samples
    (e.g. train/validation splits that provably don't overlap: sample
    the validation set from the complement).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(hash_bucket(id_col, salt) < int(fraction * _SCALE))


def weighted_hash_sample(df: DataFrame, id_col: str,
                         weight: Column | str,
                         salt: str = "") -> DataFrame:
    """Per-row keep probability = clamp(weight, 0, 1) — quality-weighted
    downsampling (keep documents proportional to a quality score, the
    importance-resampling step of a curation pipeline). Same
    content-addressed determinism contract as :func:`hash_sample`:
    the decision depends only on (key, salt, weight), so retries and
    re-partitions agree forever. Pure codegen expressions, no shuffle.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    p = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.where(
        hash_bucket(id_col, salt).cast("double") < p * float(_SCALE))


def quantile_band_filter(df: DataFrame, id_col: str,
                         score_col: str,
                         lo: float = 0.0, hi: float = 1.0,
                         group_col: str | None = None) -> DataFrame:
    """Keep rows whose ``score_col`` rank fraction within their group
    lies in (``lo``, ``hi``] — the tail-trimming curation step (drop
    the worst 5% AND the suspiciously-perfect top 1% of quality scores
    per source; both tails are where spam and template artifacts
    live). Rank-based, not value-based: robust to score distribution
    shape and engine-exact (rank_frac = rank / group size, one integer
    division — no quantile sketch, whose results depend on
    partitioning).

    Ties rank deterministically by (score, id). ``group_col=None``
    treats the whole frame as one group. Note the small-group edge:
    a group's top row sits at rank fraction 1.0, so any ``hi < 1``
    trims it — groups smaller than ~1/(1−hi) rows lose rows by
    construction; pre-filter tiny groups if that matters.

    Scale: one window per group partition (rank + count in the same
    sort) — groups are sources/domains, so partitions are large but
    the sort is per-group, never global. For the degenerate
    single-group case at corpus scale, prefer a value threshold from
    a sampled quantile instead of this exact global sort.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError("need 0 <= lo < hi <= 1")
    # NULL scores are unrankable (and NULL ordering is engine-specific:
    # Spark sorts them first ascending, others last) — dropped, and
    # excluded from the group size the fractions divide by.
    df = df.where(F.col(score_col).isNotNull())
    part = [group_col] if group_col is not None else []
    w = Window.partitionBy(*part).orderBy(F.col(score_col),
                                          F.col(id_col))
    wall = Window.partitionBy(*part)
    frac = (F.row_number().over(w).cast("double")
            / F.count("*").over(wall).cast("double"))
    return (df.withColumn("__rf", frac)
            .where((F.col("__rf") > lo) & (F.col("__rf") <= hi))
            .drop("__rf"))


def mix_corpora(sources: dict[str, DataFrame], id_col: str,
                proportions: dict[str, float],
                salt: str = "",
                size_col: str | None = None) -> DataFrame:
    """Deterministic dataset mixing — compose a training mixture from
    several corpora at target PROPORTIONS (the RedPajama/Dolma-style
    mixture step: e.g. web 0.67, code 0.15, books 0.08, ...).

    Output rows carry a ``mix_source`` tag. The largest achievable
    mixture honoring every proportion is taken: the binding source
    (largest demand/size ratio) is kept whole and every other source
    is downsampled with the content-addressed :func:`hash_sample`, so
    the result is reproducible on any engine/run/partitioning. When a
    source grows, its sampling fraction changes and the nested-
    threshold construction re-balances deterministically: the kept set
    at the lower fraction is a strict subset of the kept set at any
    higher fraction (rows shed highest-hash-first, no churn beyond
    the fraction change).

    Per-source sizes come from one ``count()`` each — metadata-sized
    driver work, same class as the IVF centroid collect. Proportions
    must sum to 1 and name exactly the sources; sources must share a
    schema (``unionByName`` — select the common columns first).

    ``size_col`` (e.g. ``n_tokens``) switches to TOKEN-weighted
    mixing — the convention pretraining mixtures are actually
    specified in. Rows are still kept/dropped whole via the uniform
    hash, so each source's realized token share equals its row
    fraction in expectation (exact when token counts are independent
    of the key hash, which content-addressed hashing guarantees up to
    sampling noise).
    """
    if set(sources) != set(proportions):
        raise ValueError("sources and proportions must name the same "
                         "corpora")
    total = sum(proportions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"proportions must sum to 1, got {total}")
    if any(p < 0 for p in proportions.values()):
        raise ValueError(
            f"proportions must be >= 0: "
            f"{ {k: p for k, p in proportions.items() if p < 0} }")
    # A 0.0 proportion is the natural way to disable a source: drop it
    # entirely (it neither constrains n_out nor emits rows) instead of
    # dividing by zero below.
    sources = {k: v for k, v in sources.items() if proportions[k] > 0}
    proportions = {k: p for k, p in proportions.items() if p > 0}
    if size_col is None:
        sizes = {name: df.count() for name, df in sources.items()}
    else:
        sizes = {name: (df.agg(F.sum(size_col)).first()[0] or 0)
                 for name, df in sources.items()}
    if any(n == 0 for n in sizes.values()):
        raise ValueError(f"empty source(s): "
                         f"{[k for k, n in sizes.items() if n == 0]}")
    # Output size N maximal s.t. prop[s]*N <= size[s] for all s.
    n_out = min(sizes[s] / proportions[s] for s in sorted(sources))
    out = None
    for name in sorted(sources):
        frac = min(1.0, proportions[name] * n_out / sizes[name])
        part = hash_sample(sources[name], id_col, frac,
                           salt=f"{salt}|{name}") \
            .withColumn("mix_source", F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out


def assign_splits(df: DataFrame, id_col: str,
                  fractions: dict[str, float],
                  salt: str = "") -> DataFrame:
    """Content-addressed train/val/test assignment: adds a ``split``
    column. Splits are provably DISJOINT and EXHAUSTIVE — the hash
    bucket is compared against consecutive ranges of one [0, 2³²)
    line, so every row lands in exactly one split, the same one on
    every engine/run/partitioning (retrain-safe: growing the corpus
    never moves an existing row between splits).

    ``fractions`` maps split name → share; shares must sum to 1
    (±1e-9). Names are assigned range positions in sorted-name order
    for determinism. Pure codegen expressions, no shuffle.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr = None
    edge = 0.0
    names = sorted(fractions)
    for name in names[:-1]:
        edge += fractions[name]
        cond = bucket < int(edge * _SCALE)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def global_shuffle(df: DataFrame, id_col: str, n_shards: int,
                   salt: str = "") -> DataFrame:
    """Deterministic global shuffle for training-order assignment:
    every row gets a ``shard`` ∈ [0, n_shards) and a dense ``pos``
    within its shard, both content-addressed — the same (key, salt)
    lands in the same place on any engine, any run, any input
    partitioning. This is the "globally shuffle the corpus before
    tokenizer sharding" step of a pretraining pipeline, without a
    global sort: hashes are uniform, so per-shard ordering by hash IS
    a uniform random permutation (ties broken by key for exactness).

    Scale: one shuffle keyed on ``shard`` (uniform by construction —
    no skew possible) + a per-shard sort; no global ordering, no
    single-reducer stage. Each shard sorts independently, so shard
    count chooses the sort granularity: pick n_shards ≈ desired output
    files and the write after this is one sorted file per shard.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    bucket = hash_bucket(id_col, salt)
    from pyspark.sql import Window
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (df.withColumn("__h", bucket)
            .withColumn("shard", F.pmod("__h", F.lit(n_shards))
                        .cast("int"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__h"))


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           fractions: dict[str, float],
                           default: float = 0.0,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 100% of low-resource languages, 10% of English). Strata absent
    from ``fractions`` fall back to ``default``."""
    thresh = F.lit(int(default * _SCALE))
    for k, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == k,
                        F.lit(int(frac * _SCALE))).otherwise(thresh)
    return df.where(hash_bucket(id_col, salt) < thresh)


def cap_per_key(df: DataFrame, id_col: str, key_col: str,
                max_per_key: int, salt: str = "",
                order_col: Column | str | None = None) -> DataFrame:
    """Per-key document cap — the web-corpus domain-cap rule (keep at
    most ``max_per_key`` docs per registered domain / source so one
    hot site cannot dominate a pretraining mixture; the per-source
    twin of :func:`mix_corpora`'s corpus-level proportions).

    Selection is deterministic. Default: rows rank within their key by
    (md5(salt ∥ id), id) — a content-addressed uniform draw, so the
    kept set is identical on any engine/run/partitioning and re-runs
    agree forever. With ``order_col``: rank by (order_col DESC, id) to
    keep the BEST n per key (quality-ranked caps). NULL keys form
    their own group (all uncategorized docs compete for one cap).

    Scale: two-phase top-n so a hot domain never lands on one task.
    Phase 1 ranks within (key, id-hash bucket) — a 10⁶-page domain
    splits across ``n_buckets`` tasks — and keeps each bucket's top
    ``max_per_key``; phase 2 ranks the ≤ ``n_buckets × max_per_key``
    survivors per key under the same total order. Any per-bucket
    top-n of a total order contains the global top-n, so the kept set
    is EXACTLY the single-window answer (the parity oracle replays
    the one-window form).
    """
    if max_per_key < 1:
        raise ValueError("max_per_key must be >= 1")
    n_buckets = 32
    if order_col is None:
        draw = F.md5(F.concat(F.lit(salt),
                              F.col(id_col).cast("string")))
        ordering = [draw.asc(), F.col(id_col).asc()]
    else:
        oc = F.col(order_col) if isinstance(order_col, str) \
            else order_col
        ordering = [oc.desc(), F.col(id_col).asc()]
    # Deterministic, partitioning-independent bucket from the id so
    # re-runs agree; NOT from the draw (order_col mode has no draw).
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                    F.lit(n_buckets))
    w1 = Window.partitionBy(F.col(key_col), bucket).orderBy(*ordering)
    cand = (df.withColumn("__rk", F.row_number().over(w1))
            .where(F.col("__rk") <= max_per_key).drop("__rk"))
    w2 = Window.partitionBy(key_col).orderBy(*ordering)
    return (cand.withColumn("__rk", F.row_number().over(w2))
            .where(F.col("__rk") <= max_per_key).drop("__rk"))


def select_token_budget(df: DataFrame, id_col: str, tokens_col: str,
                        budget: int,
                        priority_col: Column | str | None = None,
                        per_key: str | None = None) -> DataFrame:
    """Take documents in priority order until a TOKEN budget is
    reached — the "best N tokens" selection every pretraining mix ends
    with (quality-ranked corpus truncation), and with ``per_key`` the
    token-weighted domain cap (each key gets its own budget).

    Order: (priority_col DESC, id ASC); ``priority_col=None`` falls
    back to a content-addressed uniform draw (md5 of the id — a
    deterministic random sample by tokens). Keep rule: a row survives
    iff the cumulative token count of all rows STRICTLY BEFORE it is
    under ``budget`` — so the selection always makes progress (with
    any positive budget the first row is kept even if it alone exceeds
    the budget) and the kept total overshoots by less than one
    document. ``budget`` must be >= 1; a zero budget would select
    nothing under the strictly-before rule, contradicting the
    progress guarantee, so it is rejected rather than silently
    returning an empty frame. Deterministic on any
    engine/partitioning. Returns (id, n_tokens, cum_tokens
    [, per_key]) with ``cum_tokens`` the inclusive running total —
    callers join back on the id for content.

    Scale shape:

    - ``per_key`` mode: ONE window per key (shuffle on the key, keys
      process in parallel) — the token-weighted twin of
      :func:`cap_per_key`.
    - global mode: a global ordered prefix sum, done as the classic
      two-phase scan (the ``pack_sequences`` / ID-minting pattern):
      range-partition by the order key, cumsum within partitions,
      collect only the ~numPartitions partition totals, add per-
      partition offsets. No single-reducer global window, no
      driver-side data.

    NULL token counts select as zero-length (kept by order, consume
    no budget); NULL priorities sort LAST (they fill only leftover
    budget).
    """
    if budget < 1:
        raise ValueError(
            "budget must be >= 1 (a zero budget keeps nothing under "
            "the strictly-before rule, contradicting the documented "
            "first-row progress guarantee)")
    n = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    if priority_col is None:
        prio = F.md5(F.col(id_col).cast("string"))
    else:
        prio = (F.col(priority_col)
                if isinstance(priority_col, str) else priority_col)
    if per_key is not None:
        w = (Window.partitionBy(per_key)
             .orderBy(prio.desc_nulls_last(), F.col(id_col).asc())
             .rowsBetween(Window.unboundedPreceding, -1))
        before = F.coalesce(F.sum(n).over(w), F.lit(0))
        return (df.select(F.col(id_col), F.col(per_key),
                          n.alias("n_tokens"),
                          before.alias("__before"))
                .where(F.col("__before") < budget)
                .select(id_col, per_key, "n_tokens",
                        (F.col("__before")
                         + F.col("n_tokens")).alias("cum_tokens")))

    from wp_etl_migration_spark.operators.checkpoint import pin
    ordered = pin(df.select(F.col(id_col), n.alias("__n"),
                            prio.alias("__p"))
                  .repartitionByRange(F.col("__p").desc_nulls_last(),
                                      F.col(id_col).asc())
                  .sortWithinPartitions(F.col("__p").desc_nulls_last(),
                                        F.col(id_col).asc())
                  .withColumn("__pid", F.spark_partition_id()))
    part_totals = dict(ordered.groupBy("__pid")
                       .agg(F.sum("__n").alias("s"))
                       .select("__pid", "s").collect())
    offsets, acc = {}, 0
    for pid in sorted(part_totals):
        offsets[pid] = acc
        acc += part_totals[pid]
    prefix = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]) \
        if offsets else F.create_map()
    w = (Window.partitionBy("__pid")
         .orderBy(F.col("__p").desc_nulls_last(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    before = (F.coalesce(F.sum("__n").over(w), F.lit(0))
              + F.coalesce(prefix[F.col("__pid")], F.lit(0)))
    return (ordered.withColumn("__before", before)
            .where(F.col("__before") < budget)
            .select(F.col(id_col), F.col("__n").alias("n_tokens"),
                    (F.col("__before") + F.col("__n"))
                    .alias("cum_tokens")))
