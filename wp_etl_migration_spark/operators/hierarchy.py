"""Iterative parent-hierarchy resolution (SURVEY §2.4 J8).

≙ WPTermsLoader.php:180-221: terms reference parents that may themselves
need resolving/creating — unbounded recursion in the reference. Spark has
no recursive join, so we resolve by **pointer doubling** (path halving):
each round joins every unresolved node's farthest-known ancestor link to
that ancestor's own link, doubling the jump length — ``ceil(log2(depth))``
rounds instead of ``depth`` level-by-level rounds. Each round is one
equi-join on the (re-checkpointed, small) link table; at 100 TB depth-64
hierarchies cost 6 joins.

Rows whose ancestry never reaches a root (dangling parents / cycles — the
reference creates placeholders for these, WPTermsLoader.php:204-210) come
back with NULL root/depth so the caller can apply its placeholder policy
explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from wp_etl_migration_spark.operators.checkpoint import pin


def _checkpoint_with_probe(df: DataFrame) -> tuple[DataFrame, int, int]:
    """Materialize one round's link table AND read its convergence
    metrics (unresolved count, total jump distance) from the same job:
    the Observation node is measured while the eager checkpoint scan
    runs, so each round costs exactly one action instead of
    checkpoint + a separate driver-side agg."""
    obs = Observation()
    out = pin(df.observe(
        obs,
        F.count(F.when(~F.col("__done"), 1)).alias("n"),
        F.coalesce(F.sum(F.when(~F.col("__done"), F.col("__dist"))),
                   F.lit(0)).alias("s")))
    m = obs.get
    return out, m["n"], m["s"]


def resolve_paths(df: DataFrame, id_col: str, parent_col: str,
                  max_rounds: int = 20) -> DataFrame:
    """Resolve each node's root ancestor and depth.

    Input: one row per node with ``id_col`` and nullable ``parent_col``
    (NULL parent ⇒ root). Output: ``id_col, root_id (long), depth (int)``
    — NULLs for unreachable rows. ``max_rounds`` bounds cyclic inputs;
    2^max_rounds is the resolvable depth (20 ⇒ 1M levels).
    """
    nodes = df.select(F.col(id_col).alias("__id"),
                      F.col(parent_col).alias("__parent"))
    # Link state: __anc is an ancestor exactly __dist edges up; __done
    # once __anc is a root (then __dist is the node's depth).
    state, n, s = _checkpoint_with_probe(nodes.select(
        "__id",
        F.coalesce("__parent", "__id").alias("__anc"),
        F.when(F.col("__parent").isNull(), 0).otherwise(1).alias("__dist"),
        F.col("__parent").isNull().alias("__done"),
    ))

    prev = (-1, -1)
    for _ in range(max_rounds):
        if n == 0 or (n, s) == prev:
            # Fully resolved, or only dangling chains remain (count and
            # total distance both frozen — cyclic rows keep growing
            # __dist, so they don't trigger this exit).
            break
        prev = (n, s)
        a, b = state.alias("a"), state.alias("b")
        state, n, s = _checkpoint_with_probe(
            a.join(b, F.col("a.__anc") == F.col("b.__id"), "left")
            .select(
                F.col("a.__id").alias("__id"),
                F.when(F.col("a.__done") | F.col("b.__id").isNull(),
                       F.col("a.__anc"))
                .otherwise(F.col("b.__anc")).alias("__anc"),
                F.when(F.col("a.__done") | F.col("b.__id").isNull(),
                       F.col("a.__dist"))
                .otherwise(F.col("a.__dist") + F.col("b.__dist"))
                .alias("__dist"),
                (F.col("a.__done")
                 | F.coalesce(F.col("b.__done"), F.lit(False)))
                .alias("__done")))

    return state.select(
        F.col("__id").alias(id_col),
        F.when(F.col("__done"), F.col("__anc")).cast("long")
        .alias("root_id"),
        F.when(F.col("__done"), F.col("__dist")).cast("int")
        .alias("depth"))
