"""Fuzzy (edit-distance) key matching without a cross join
(LLM-pipeline / entity-resolution extension; no counterpart in the
reference, which matches keys exactly).

``fuzzy_self_join`` finds all row pairs whose key strings are within
edit distance ``max_distance`` (1 or 2), using FastSS
deletion-neighborhood indexing (Bocek et al. 2007, public): every key
emits its depth-``d`` deletion neighborhood (itself, every single
deletion, and for d=2 every position pair deleted) as index
variants; FastSS's theorem guarantees two keys at edit distance ≤ d
share at least one variant (equal → the full key; insertion/deletion
→ one side's deletion is the other's; substitution → deleting the
differing position from both sides). Candidates from the variant
equi-join are then verified with the built-in ``levenshtein`` —
candidate-bounded, exact, and complete for distance ≤ d.

This is the dedup primitive for near-identical identifiers: URLs with
one-character typos, doubled-letter usernames, off-by-one SKU codes.

Scale: the variant index is an explode of the KEY column only (not
the rows), joined on xxhash64(variant) — an equi-join, never a
cartesian. Cost grows with the neighborhood: depth 1 emits len+1
variants per key; depth 2 emits 1 + len + len·(len−1)/2 (quadratic in
key length — ~200 variants for an 18-char key; keep ED=2 for short
identifier columns, not sentences). The verify pass runs
``levenshtein`` on candidate pairs only. Hot variants (short keys
collapse to few deletions: every 2-char key shares single-char
variants) fan out harder at depth 2; ``max_bucket`` drops variant
buckets above the cap — the same guard-and-tradeoff as the LSH band
caps, and short keys are exactly where fuzzy matching is noise
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _del1(k, p):
    """Delete the 1-based position ``p`` from ``k`` (p = 0: keep)."""
    return F.when(p == 0, k).otherwise(
        F.concat(k.substr(F.lit(1), p - 1),
                 k.substr(p + 1, F.length(k))))


def _del2(k, p1, p2):
    """Delete 1-based positions ``p1 < p2`` from ``k``."""
    return F.concat(k.substr(F.lit(1), p1 - 1),
                    k.substr(p1 + 1, p2 - p1 - 1),
                    k.substr(p2 + 1, F.length(k)))


def _variants(df: DataFrame, id_col: str, key_col: str,
              depth: int = 1) -> DataFrame:
    """(id, variant-hash) — the depth-``depth`` FastSS deletion
    neighborhood: the key itself, every single deletion, and (depth 2)
    every canonical position pair ``p1 < p2`` deleted from the
    ORIGINAL string (canonical pairs enumerate each 2-deletion variant
    once, not twice).

    Only the 16-byte (id, hash) pair leaves this function — key
    strings rejoin AFTER candidate dedup (see the join functions), so
    the variant shuffle stays narrow at any key width.

    The output is distinct per (id, variant): deleting different
    positions inside a run of identical characters yields the SAME
    variant string (a key with a 5-zero run emits C(5,2)=10 copies of
    one variant at depth 2), and the downstream equi-join would fan
    out as copies_a × copies_b PER CANDIDATE PAIR before any dedup —
    a quadratic blow-up on padded identifiers. One map-side-combinable
    distinct keeps the join input set-shaped."""
    key = F.col(key_col)
    k = F.col("__key")
    p1, p2 = F.col("__p1"), F.col("__p2")
    base = df.select(F.col(id_col), key.alias("__key"))

    def _dedup(vh: DataFrame) -> DataFrame:
        # One shuffle instead of two (r14): a plain distinct()
        # exchanges on (id, __v), and the downstream variant equi-join
        # then re-exchanges the whole table on __v alone — the 100×
        # study watched that second 72M-row shuffle. Partitioning by
        # __v satisfies BOTH: it clusters every (id, __v) duplicate
        # (subset-key partitioning satisfies the dedup's required
        # clustering) and is exactly the join's distribution, so the
        # dedup's exchange is the join's exchange.
        return (vh.repartition("__v")
                .dropDuplicates([vh.columns[0], "__v"]))

    if depth == 1:
        # (0) keeps the full key; p in 1..len deletes the p-th char.
        v = _del1(k, p2)
        return _dedup(base.select(
            F.col(id_col), "__key",
            F.explode(F.sequence(F.lit(0), F.length(k)))
            .alias("__p2"))
            .select(F.col(id_col), F.xxhash64(v).alias("__v")))
    # depth 2: (0,0) full key; (0,p) single deletions; (p1<p2) doubles.
    seconds = F.when(
        p1 == 0, F.sequence(F.lit(0), F.length(k))).otherwise(
        F.when(p1 < F.length(k),
               F.sequence(p1 + 1, F.length(k)))
        .otherwise(F.array().cast("array<int>")))
    v = F.when((p1 == 0) & (p2 == 0), k) \
         .when(p1 == 0, _del1(k, p2)) \
         .otherwise(_del2(k, p1, p2))
    return _dedup(base.select(
        F.col(id_col), "__key",
        F.explode(F.sequence(F.lit(0), F.length(k))).alias("__p1"))
        .select(F.col(id_col), "__key", "__p1",
                F.explode(seconds).alias("__p2"))
        .select(F.col(id_col), F.xxhash64(v).alias("__v")))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_id: str, left_key: str,
               right_id: str, right_key: str,
               max_distance: int = 1,
               max_bucket: int | None = None,
               parallelize: bool = True) -> DataFrame:
    """Two-table fuzzy key join — the entity-resolution shape (match a
    crawl's author strings against a canonical user table, SKUs against
    a catalog): all (left, right) pairs whose keys are within
    ``max_distance`` (1 or 2) edit distance.

    Returns (left_id, right_id, left_key, right_key, distance); NULL
    keys on either side are excluded. Same FastSS construction and
    guards as :func:`fuzzy_self_join`; the variant equi-join is
    left-variants × right-variants, so the small side (the canonical
    table) broadcasts and the big side streams map-side.
    """
    if max_distance not in (1, 2):
        raise ValueError(
            "deletion-neighborhood indexing supports max_distance 1 "
            "or 2 (cost grows quadratically with key length at 2)")
    if left_id == right_id:
        raise ValueError(
            "left_id and right_id must differ (both become output "
            "columns) — withColumnRenamed one side first")
    from wp_etl_migration_spark.operators.checkpoint import pin
    # Pin the narrow (id, key) projections once: the variant fanout
    # AND the key re-join both read them, so an unpinned frame would
    # re-run the upstream lineage (filters, prior joins) twice per
    # side. Mirrors semantic_dedup's pin() pattern.
    left = pin(left.select(left_id, left_key))
    right = pin(right.select(right_id, right_key))
    if parallelize:
        from wp_etl_migration_spark.operators.dedup import (
            spread_thin_input)
        left, right = spread_thin_input(left), spread_thin_input(right)
    lv = _variants(left, left_id, left_key, depth=max_distance)
    rv = _variants(right, right_id, right_key, depth=max_distance)
    if max_bucket is not None:
        both = lv.select("__v").unionByName(rv.select("__v"))
        cool = (both.groupBy("__v").count()
                .where(F.col("count") <= max_bucket).select("__v"))
        lv = lv.join(cool, "__v", "left_semi")
        rv = rv.join(cool, "__v", "left_semi")
    # Candidate ID pairs first (16-byte rows through the fanout), keys
    # re-joined only for the distinct survivors — the levenshtein
    # verify touches each unique pair once regardless of how many
    # variants it shares. The canonical side carries a shuffle_hash
    # hint: post-explode size estimates are the narrow frame's (see
    # fuzzy_self_join — measured 25× wall at 1.5M keys when the
    # planner broadcast an 84M-row variant side), so broadcast
    # selection here would trust a ~(variants/key)× underestimate;
    # SHJ builds on the (truly smaller) canonical variants instead.
    cand = (lv.join(rv.hint("shuffle_hash"), on="__v")
            .select(left_id, right_id).distinct())
    lk = left.select(F.col(left_id),
                     F.col(left_key).alias("left_key")).distinct()
    rk = right.select(F.col(right_id),
                      F.col(right_key).alias("right_key")).distinct()
    return (cand.join(lk, on=left_id).join(rk, on=right_id)
            .withColumn("distance",
                        F.levenshtein("left_key", "right_key"))
            .where(F.col("distance") <= max_distance)
            .select(left_id, right_id, "left_key", "right_key",
                    "distance"))


def fuzzy_self_join(df: DataFrame, id_col: str, key_col: str,
                    max_distance: int = 1,
                    max_bucket: int | None = None,
                    parallelize: bool = True) -> DataFrame:
    """All pairs (id_a < id_b) whose keys are within ``max_distance``
    (1 or 2 — the supported deletion-neighborhood depths) edit
    distance, with both keys and the exact distance.

    Returns (id_a, id_b, key_a, key_b, distance). Rows with NULL keys
    are excluded (a NULL key has no edit distance to anything — the
    variant generator drops them, matching SQL join semantics).
    ``parallelize``
    spreads a thin (fewer-tasks-than-cores) input before the variant
    explode: the variant side is small enough that Catalyst broadcasts
    it, so WITHOUT a spread the probe side — explode, hash, AND the
    levenshtein verify — all run at the scan's task count (one task on
    a single-row-group file; ~4.5× at sf0.1). See
    :func:`operators.dedup.spread_thin_input`.
    """
    if max_distance not in (1, 2):
        raise ValueError(
            "deletion-neighborhood indexing supports max_distance 1 "
            "or 2; the depth-d neighborhood is len^d-sized, so larger "
            "radii need a different blocking scheme")
    from wp_etl_migration_spark.operators.checkpoint import pin
    # Pin the narrow (id, key) projection once: the variant fanout and
    # the two key re-joins all read it, so an unpinned frame would
    # re-run the upstream lineage three times.
    df = pin(df.select(id_col, key_col))
    if parallelize:
        from wp_etl_migration_spark.operators.dedup import (
            spread_thin_input)
        df = spread_thin_input(df)
    v = _variants(df, id_col, key_col, depth=max_distance)
    if max_bucket is not None:
        cool = (v.groupBy("__v").count()
                .where(F.col("count") <= max_bucket).select("__v"))
        v = v.join(cool, "__v", "left_semi")
    # The variant self-join must NEVER broadcast: Catalyst's size
    # estimate for the exploded variant frame is the NARROW (id, key)
    # frame's — the generate doesn't scale it — so a corpus whose
    # variant table is 50× the threshold still looks broadcastable.
    # Measured (r14 sf10 decade): at 1.5M keys the planner broadcast
    # the 84M-row variant side and the wall went 7.7 → 193 s
    # (exponent 1.40); the shuffle_hash hint (hints out-rank size
    # estimates) restores the hash-partitioned equi-join the
    # construction is designed around.
    a = v.alias("a").hint("shuffle_hash")
    b = v.alias("b").hint("shuffle_hash")
    # Candidate ID pairs first (16-byte rows through the fanout), keys
    # re-joined only for the distinct survivors.
    cand = (a.join(b, on="__v")
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())
    ka = df.select(F.col(id_col).alias("id_a"),
                   F.col(key_col).alias("key_a")).distinct()
    kb = df.select(F.col(id_col).alias("id_b"),
                   F.col(key_col).alias("key_b")).distinct()
    return (cand.join(ka, on="id_a").join(kb, on="id_b")
            .withColumn("distance", F.levenshtein("key_a", "key_b"))
            .where(F.col("distance") <= max_distance)
            .select("id_a", "id_b", "key_a", "key_b", "distance"))
