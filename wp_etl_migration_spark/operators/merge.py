"""Join-based MERGE / upsert primitives (SURVEY §2.2 L5–L9, §2.4 J4–J6).

The reference's loaders do row-at-a-time lookup-before-insert
(WordPressPostLoader.php:172-194 etc.). Spark-first that becomes a set
operation over the whole batch:

- matched rows   → source values win (full replace or per-column update)
- unmatched target rows → kept
- unmatched source rows → inserted

``merge_upsert`` is the plain-Parquet strategy (MERGE INTO needs Delta);
it is one shuffle on the key (both sides hash-partitioned) and AQE handles
skew. The anti-join side broadcasts automatically when small.

``cascaded_lookup`` is the existence probe with key fallback
(≙ user lookup by email then login, WPUserLoader.php:83-90; term lookup by
id → slug → name, WordPressTermLoader.php:118-145).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame,
                 keys: Sequence[str],
                 update_cols: Sequence[str] | None = None) -> DataFrame:
    """SQL-MERGE semantics on plain DataFrames.

    With ``update_cols`` only those columns take the source value on
    match (partial update ≙ the reference's update-vs-insert branches,
    WPPostsLoader.php:119-146); otherwise the whole source row replaces
    the matched target row.
    """
    keys = list(keys)
    if update_cols is None:
        # Full-row replace: source rows + target rows with no source match.
        survivors = target.join(source.select(*keys), on=keys,
                                how="left_anti")
        return survivors.unionByName(source.select(*target.columns))

    upd = set(update_cols)
    src_cols = [F.col("s." + c).alias("__src_" + c) for c in upd]
    joined = target.alias("t").join(
        source.alias("s").select(*keys, *[F.col(c) for c in upd]).alias("s"),
        on=keys, how="left")
    # Re-select target schema, preferring source values for update_cols.
    merged = joined.select(
        *[F.col(k) for k in keys],
        *[F.coalesce(F.col("s." + c), F.col("t." + c)).alias(c)
          if c in upd else F.col("t." + c)
          for c in target.columns if c not in keys],
    )
    inserts = source.join(target.select(*keys), on=keys, how="left_anti")
    return merged.unionByName(inserts.select(*target.columns))


def cascaded_lookup(incoming: DataFrame, existing: DataFrame,
                    id_col: str,
                    key_sets: Sequence[Sequence[str]],
                    out_col: str = "matched_id") -> DataFrame:
    """Probe ``existing`` by each key set in order; first hit wins.

    Returns ``incoming`` plus ``out_col`` (null → no match at any level,
    i.e. the insert branch). Duplicate keys in ``existing`` resolve to the
    MIN id — deterministic, unlike an arbitrary dropDuplicates. Each probe
    is a broadcast-eligible left join.

    Null-key routing: rows with a NULL in any probe key can never hit
    an equi-join, yet a hash exchange sends every one of them to the
    SAME partition — and "no id yet" is the COMMON case in a migration
    load, so the id-level probe would otherwise funnel the whole batch
    through one task (measured in the skew bed: 10,800 of 10,800 rows
    on one reducer). A SALT join key fixes the placement without
    touching semantics: the join gains one extra bigint key that is 0
    on the probe side and 0 for valid incoming rows, but a
    deterministic per-row hash for null-key rows — those spread
    uniformly across reducers and still match nothing (a null equi-key
    never matches regardless of the salt), so the left join hands them
    the same null hit. Earlier rounds instead SPLIT the plan
    (``where(key_ok)`` joined ∪ ``where(~key_ok)`` bypassing), which
    doubled the incoming scan per probe level — 2^levels leaf scans,
    4 orders scans for a 2-level cascade — and made the first
    execution pay ~2× in codegen compile alone (r11 verdict: the
    bench's least stable row).

    Hot-key routing for the non-null rows relies on AQE skew-join
    splitting, which pattern-matches ONLY ``SMJ(Sort←ShuffleStage,
    Sort←ShuffleStage)``: with the probe's final HashAggregate fused
    into the join stage, Spark declines to optimize EITHER side, so a
    10k× duplicated incoming slug rode one reducer unsplit (measured
    10,013 max vs 639 with the split). ``hint("rebalance")`` on the
    probe breaks the fusion — the join then adds its own
    ENSURE_REQUIREMENTS exchange, the only shuffle origin the skew
    rule accepts (an explicit ``repartition(ks)`` does NOT qualify and
    stays unsplit). Costs one extra shuffle of the already-reduced
    one-row-per-key probe; the fat incoming side still shuffles once.
    """
    import functools
    import operator

    from pyspark.sql.types import MapType

    # Deterministic per-row salt (xxhash64 over the hashable incoming
    # columns — maps are unhashable; nondeterministic exprs like
    # monotonically_increasing_id are rejected in join keys). Names
    # are backtick-quoted: migration frames carry dotted prefix
    # columns ("post.ID") that a bare F.col would read as a struct
    # field access.
    hashable = ["`" + f.name.replace("`", "``") + "`"
                for f in incoming.schema.fields
                if not isinstance(f.dataType, MapType)]
    row_salt = (F.xxhash64(*[F.col(c) for c in hashable])
                if hashable else F.lit(1).cast("long"))

    out = incoming
    hit_cols = []
    for i, ks in enumerate(key_sets):
        ks = list(ks)
        salt = f"__casc_salt{i}"
        probe = (existing
                 .groupBy(*ks)
                 .agg(F.min(id_col).alias(f"__hit{i}"))
                 .withColumn(salt, F.lit(0).cast("long"))
                 .hint("rebalance"))
        key_ok = functools.reduce(
            operator.and_, [F.col(c).isNotNull() for c in ks])
        out = (out.withColumn(
                   salt, F.when(key_ok, F.lit(0).cast("long"))
                          .otherwise(row_salt))
               .join(probe, on=[*ks, salt], how="left")
               .drop(salt))
        hit_cols.append(f"__hit{i}")
    out = out.withColumn(out_col, F.coalesce(*[F.col(h) for h in hit_cols]))
    return out.drop(*hit_cols)
