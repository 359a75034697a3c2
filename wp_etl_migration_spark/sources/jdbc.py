"""Live-database (JDBC) sources (SURVEY §2.1 — the reference reads the
live WordPress MySQL via ``$wpdb``, WPPostsExtractor.php:37-89; this
module is the engine's equivalent entry point).

Spark-first: ``spark.read.format("jdbc")`` is a full Catalyst data
source — filters and column pruning push down into the remote SQL
(visible as ``PushedFilters`` in the plan), and a partitioned read
(``partitionColumn`` + bounds + ``numPartitions``) turns the single
database cursor into N parallel range queries, which is what makes a
100M-row wp_posts table extractable without a single-threaded scan.

For a real WP migration::

    t = wp_jdbc_tables(spark, "jdbc:mysql://db/wp",
                       user="...", password="...",
                       partition_column="ID", num_partitions=64)
    posts = WPPostsSource(t["posts"], meta=t["postmeta"], ...)

The per-table id bounds are probed with one tiny min/max query each
(aggregate pushdown — the probe never scans the table).

No MySQL exists in this sandbox; tests run the same code path against
Spark's bundled embedded Derby, which exercises the real JDBC relation
(pushdown, partitioned reads) end-to-end in-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: WP core tables a migration reads, in reference-extractor order
#: (posts/meta ≙ WPPostsExtractor, terms family ≙ WPTermExtractor,
#: users/meta ≙ WPUserExtractor).
WP_TABLES = ("posts", "postmeta", "terms", "term_taxonomy",
             "term_relationships", "users", "usermeta")

#: Primary-key column per WP table — the natural partition column for
#: parallel reads (monotone auto-increment ids: near-uniform ranges).
WP_PARTITION_KEYS = {
    "posts": "ID", "postmeta": "meta_id", "terms": "term_id",
    "term_taxonomy": "term_taxonomy_id",
    "term_relationships": "object_id", "users": "ID",
    "usermeta": "umeta_id",
}


def from_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              num_partitions: int | None = None,
              fetchsize: int = 10_000,
              **options) -> DataFrame:
    """One JDBC table (or ``(subquery) alias``) as a DataFrame.

    With ``partition_column`` + ``num_partitions`` the read issues N
    parallel range-bounded queries; missing bounds are probed with one
    ``min/max`` aggregate round-trip (pushed down — no table scan).
    ``fetchsize`` keeps the driver cursor streaming instead of
    buffering whole result sets (the JDBC default on MySQL).
    Extra ``options`` pass straight through (``driver``, ``user``,
    ``password``, ``sessionInitStatement``, ...).
    """
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("fetchsize", str(fetchsize)))
    for k, v in options.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if num_partitions is None:
            num_partitions = int(
                spark.conf.get("spark.sql.shuffle.partitions", "32"))
        if lower_bound is None or upper_bound is None:
            probed = _probe_bounds(spark, url, table, partition_column,
                                   **options)
            if probed is None:
                # Empty table: bounds are irrelevant, read single-part.
                return reader.load()
            lo, hi = probed
            lower_bound = lo if lower_bound is None else lower_bound
            upper_bound = hi if upper_bound is None else upper_bound
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.load()


def bounds_probe_sql(table: str, column: str) -> str:
    """The dbtable subquery the bounds probe issues — ANSI kept to the
    dialect-portable intersection: a DERIVED TABLE WITH AN ALIAS
    (MySQL rejects an unaliased derived table: error 1248), plain
    MIN/MAX (pushed down on MySQL, Derby, Postgres alike), and
    unquoted identifiers (the WP schema's column names are unreserved
    in both MySQL's backtick and ANSI double-quote regimes)."""
    return (f"(SELECT MIN({column}) AS lo, MAX({column}) AS hi "
            f"FROM {table}) bounds_probe")


def _probe_bounds(spark: SparkSession, url: str, table: str,
                  column: str, **options) -> tuple[int, int] | None:
    """min/max of the partition column via one pushed-down aggregate
    (a 1-row JDBC round-trip, never a scan); None for an empty table."""
    probe = (spark.read.format("jdbc")
             .option("url", url)
             .option("dbtable", bounds_probe_sql(table, column)))
    for k, v in options.items():
        probe = probe.option(k, v)
    # Positional access: engines disagree on alias case (Derby uppercases
    # unquoted identifiers; MySQL preserves them).
    row = probe.load().first()
    if row is None or row[0] is None:
        return None
    return int(row[0]), int(row[1])


def wp_jdbc_tables(spark: SparkSession, url: str, prefix: str = "wp_",
                   partition_column: bool | None = None,
                   num_partitions: int | None = None,
                   tables: tuple[str, ...] = WP_TABLES,
                   **options) -> dict[str, DataFrame]:
    """All WP core tables for the extractor builders, keyed without the
    site prefix: ``{"posts": df, "postmeta": df, ...}``.

    ``partition_column=True`` (recommended for big sites) partitions
    each table's read on its primary key with probed bounds — the
    parallel-extract path. Lazy frames: nothing is read until an
    action, and per-extractor filters (post_type, status...) push down
    into the remote SQL through the normal Catalyst route.
    """
    out: dict[str, DataFrame] = {}
    for t in tables:
        pcol = WP_PARTITION_KEYS[t] if partition_column else None
        out[t] = from_jdbc(spark, url, f"{prefix}{t}",
                           partition_column=pcol,
                           num_partitions=num_partitions, **options)
    return out
