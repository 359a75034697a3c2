"""Dataset profiling diagnostics (beyond reference — the operational
companions to the analyze family, SURVEY §2.6/A1).

``profile_table``  — per-column completeness/cardinality/range summary
in ONE job: the approx mode is a single aggregation pass (scan cost
paid once regardless of column count); the exact mode unions one
single-distinct aggregation per column — 1-column pruned scans, so a
columnar source still reads each byte once overall — because Spark
plans multi-column exact distincts via EXPAND (input replicated per
column into a full-width sort).

``key_skew_profile`` — hot-key diagnostic for shuffle planning: top-k
keys by frequency with their share of rows and skew factor (count over
mean count per key). This is the measurement step behind choosing the
``operators/skew`` levers (salting / AQE skew join): a key with skew
factor ≫ cores is the one that strands a 1000-executor stage on one
task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame,
                  cols: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str). Min/max/distinct compare the column's native
    type, then render as strings so heterogeneous columns stack into
    one frame.

    ``exact_distinct=True`` uses ``count(DISTINCT)`` — engine-portable
    (what the DuckDB oracle checks). Spark plans MULTI-column exact
    distincts via EXPAND — every input row replicated (column count +
    1) times into a full-width SORT before a sort-based aggregation —
    so the exact mode runs one single-distinct aggregation PER column
    instead (r14): each branch is a 1-column pruned scan (columnar
    input: the union reads each byte once overall) through the
    two-level single-distinct rewrite — hash aggregation, partial
    combine, no expand, no sort — and the branches run concurrently
    inside the one union job. ``exact_distinct=False`` keeps the
    single-pass wide aggregation: HLL-sketched
    ``approx_count_distinct`` (±2.3% default rsd) is a plain
    aggregate, one narrow pass with no expand — the 100 TB mode.

    Exact-mode caveat (ADVICE r14): the per-column branches each scan
    the input, which "reads each byte once overall" only for COLUMNAR
    file sources (each branch prunes to its one column). For
    row-oriented sources (CSV/JSON/JDBC) or when ``df`` is an
    expensive computed frame, every branch re-executes the full
    upstream plan — ``df.persist()`` first, or use
    ``exact_distinct=False`` (single pass) there. The union of the
    branches folds as a balanced tree so plan depth stays
    O(log n_cols) on very wide tables, not O(n_cols).
    """
    cols = cols or df.columns
    if exact_distinct:
        parts = [
            df.select(F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0))
                 .alias("n_nulls"),
                 F.countDistinct("__v").alias("n_distinct"),
                 F.min("__v").cast("string").alias("min_str"),
                 F.max("__v").cast("string").alias("max_str"))
            .select(F.lit(c).alias("col_name"), "n_rows", "n_nulls",
                    "n_distinct", "min_str", "max_str")
            for c in cols]
        while len(parts) > 1:       # balanced union: O(log n) depth
            parts = [parts[i].unionByName(parts[i + 1])
                     if i + 1 < len(parts) else parts[i]
                     for i in range(0, len(parts), 2)]
        return parts[0]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"__null{i}"),
            F.approx_count_distinct(F.col(c)).alias(f"__dist{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max{i}"),
        ]
    wide = df.agg(*aggs)
    # Column names land in the stack() expr as SQL string literals —
    # backslash-escape so quotes in a name can't break (or inject into)
    # the parsed expression.
    def _lit(c: str) -> str:
        return c.replace("\\", "\\\\").replace("'", "\\'")
    stacked = ", ".join(
        f"'{_lit(c)}', __null{i}, __dist{i}, __min{i}, __max{i}"
        for i, c in enumerate(cols))
    return wide.select(
        F.expr(f"stack({len(cols)}, {stacked}) as "
               "(col_name, n_nulls, n_distinct, min_str, max_str)"),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_str", "max_str")


def profile_diff(before: DataFrame, after: DataFrame,
                 cols: list[str] | None = None,
                 null_rate_tol: float = 0.05,
                 distinct_ratio_tol: float = 0.5,
                 exact_distinct: bool = False) -> DataFrame:
    """Schema/content drift between two snapshots of the same dataset
    — the pre-flight check before pointing yesterday's pipeline at
    today's extract. Compares :func:`profile_table` outputs:

    Returns one row per column present in EITHER snapshot:
    (col_name, status, null_rate_before, null_rate_after,
    n_distinct_before, n_distinct_after) where ``status`` is
    ``added`` / ``removed`` / ``drifted`` (null-rate moved more than
    ``null_rate_tol`` absolute, or distinct count changed by more
    than ``distinct_ratio_tol`` relative) / ``ok``.

    Both profiles are single-pass scans (HLL distincts by default —
    the scale mode; ``exact_distinct=True`` switches to portable
    ``count(DISTINCT)`` for engine-exact parity at the cost of an
    EXPAND); the diff join is column-count-sized.
    """
    def prof(df: DataFrame) -> DataFrame:
        return profile_table(df, cols=cols,
                             exact_distinct=exact_distinct) \
            .select("col_name",
                    (F.col("n_nulls").cast("double")
                     / F.col("n_rows").cast("double"))
                    .alias("null_rate"),
                    F.col("n_distinct"))
    b = prof(before).select(F.col("col_name"),
                            F.col("null_rate").alias("null_rate_before"),
                            F.col("n_distinct").alias("n_distinct_before"))
    a = prof(after).select(F.col("col_name"),
                           F.col("null_rate").alias("null_rate_after"),
                           F.col("n_distinct").alias("n_distinct_after"))
    j = b.join(a, "col_name", "full_outer")
    drift = (
        (F.abs(F.col("null_rate_after") - F.col("null_rate_before"))
         > null_rate_tol)
        | (F.abs(F.col("n_distinct_after").cast("double")
                 - F.col("n_distinct_before").cast("double"))
           > distinct_ratio_tol
           * F.greatest(F.col("n_distinct_before").cast("double"),
                        F.lit(1.0))))
    status = (F.when(F.col("null_rate_before").isNull(), "added")
              .when(F.col("null_rate_after").isNull(), "removed")
              .when(drift, "drifted")
              .otherwise("ok"))
    return j.select("col_name", status.alias("status"),
                    "null_rate_before", "null_rate_after",
                    "n_distinct_before", "n_distinct_after")


def corpus_report(df: DataFrame, id_col: str, text_col: str,
                  lang_col: str | None = None) -> DataFrame:
    """One-row corpus health summary — the LLM-side "analyze" pass
    (the reference's analyze command reports row counts; a training
    corpus needs the content-level equivalents):

    - ``n_docs``, ``n_tokens``, ``avg_tokens``
    - ``approx_distinct_texts`` (HLL over the normalized fingerprint)
      and ``dup_rate`` = 1 − distinct/docs — the exact-dup estimate
      without a dedup shuffle
    - ``avg_quality`` (heuristic quality score)
    - ``langs`` — map lang → doc count (when ``lang_col`` given)

    ONE aggregation pass over the corpus (no per-metric jobs): the
    scan is paid once, every metric is map-side combinable, and the
    fingerprint distinct is an HLL sketch (±2.3%), not a shuffle.
    Floats here are diagnostics, not oracle-hashable contracts.
    """
    from wp_etl_migration_spark.operators.textstats import (
        fingerprint, quality_score, token_count)
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(token_count(text_col)).cast("long").alias("n_tokens"),
        F.avg(token_count(text_col)).alias("avg_tokens"),
        F.approx_count_distinct(fingerprint(text_col))
        .alias("approx_distinct_texts"),
        F.avg(quality_score(text_col)).alias("avg_quality"),
    ]
    if lang_col is not None:
        aggs.append(F.map_from_entries(F.collect_list(F.struct(
            F.col("__lang"), F.col("__n")))).alias("langs"))
        # NULL map keys are illegal in Spark (map_from_entries raises
        # at runtime), and realistic corpora do have missing langs —
        # bucket them under 'unknown'.
        per_lang = (df.groupBy(
            F.coalesce(F.col(lang_col).cast("string"),
                       F.lit("unknown")).alias("__lang"))
            .agg(F.count("*").alias("__n")))
        # the lang rollup is its own tiny agg (langs are few); the
        # heavy text metrics stay in the single main pass. The two
        # 1-row frames are combined by union + first(ignorenulls) —
        # joining them on a constant key constant-folds into a
        # BroadcastNestedLoopJoin, which would false-fail pipelines
        # wrapped in plancheck.assert_scalable.
        main = df.agg(*aggs[:-1])
        langs = per_lang.agg(aggs[-1])
        out = (main.unionByName(langs, allowMissingColumns=True)
               .agg(*[F.first(c, ignorenulls=True).alias(c)
                      for c in main.columns + ["langs"]]))
    else:
        out = df.agg(*aggs)
    # HLL can overestimate distincts by its rsd (±2.3%), which would
    # read as a (nonsensical) negative dup rate on a clean corpus.
    return out.withColumn(
        "dup_rate",
        F.greatest(
            F.lit(1.0) - F.col("approx_distinct_texts").cast("double")
            / F.col("n_docs").cast("double"),
            F.lit(0.0)))


def key_skew_profile(df: DataFrame, key_col: str,
                     top_k: int = 10) -> DataFrame:
    """Top-``top_k`` keys by row count: (key, n, share, skew_factor),
    skew_factor = key count over the mean count across all keys. One
    groupBy shuffle + a single-row aggregate joined back (broadcast).
    Ties rank by key value for determinism.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")) \
               .agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"),
        F.avg("n").alias("__mean"))
    ranked = (counts.crossJoin(F.broadcast(totals))
              .withColumn("share", F.col("n") / F.col("__total"))
              .withColumn("skew_factor", F.col("n") / F.col("__mean"))
              .withColumn("__rk", F.row_number().over(
                  Window.orderBy(F.col("n").desc(), F.col("key"))))
              .where(F.col("__rk") <= top_k))
    return ranked.select("key", "n", "share", "skew_factor")
