"""Iterative parent-hierarchy resolution (SURVEY §2.4 J8).

≙ WPTermsLoader.php:180-221: terms reference parents that may themselves
need resolving/creating — unbounded recursion in the reference. Spark has
no recursive join, so we resolve by level-synchronous propagation from the
roots: each round joins the unresolved frontier to the rows resolved last
round. Rounds = hierarchy depth (real taxonomies: < 10); each round is one
shuffle-or-broadcast join and the resolved set only grows, so the plan is
bounded and AQE-friendly. Rows whose ancestry never reaches a root
(dangling parents / cycles — the reference creates placeholders for these,
WPTermsLoader.php:204-210) come back with NULL root/depth so the caller
can apply its placeholder policy explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_paths(df: DataFrame, id_col: str, parent_col: str,
                  max_iter: int = 30,
                  checkpoint_every: int = 8) -> DataFrame:
    """Resolve each node's root ancestor and depth.

    Input: one row per node with ``id_col`` and nullable ``parent_col``
    (NULL / missing parent id ⇒ root). Output columns:
    ``id_col, root_id (long), depth (int)`` — NULLs for unreachable rows.
    """
    nodes = df.select(F.col(id_col).alias("__id"),
                      F.col(parent_col).alias("__parent")).cache()
    ids = nodes.select(F.col("__id").alias("__known"))
    # Nodes whose parent id actually exists; dangling-parent nodes can
    # never resolve and fall out as NULLs at the end.
    with_parent_known = nodes.join(
        ids.withColumnRenamed("__known", "__parent"),
        on="__parent", how="left_semi")

    resolved = (nodes.where(F.col("__parent").isNull())
                .select("__id",
                        F.col("__id").alias("__root"),
                        F.lit(0).alias("__depth")))
    frontier = resolved
    remaining = with_parent_known
    for i in range(max_iter):
        if not frontier.take(1):
            break
        step = (remaining.alias("n")
                .join(frontier.alias("f"),
                      F.col("n.__parent") == F.col("f.__id"))
                .select(F.col("n.__id").alias("__id"),
                        F.col("f.__root").alias("__root"),
                        (F.col("f.__depth") + 1).alias("__depth")))
        step = step.localCheckpoint(eager=True) \
            if (i + 1) % checkpoint_every == 0 else step.cache()
        frontier = step
        resolved = resolved.unionByName(step)

    unresolved = (nodes
                  .join(resolved.select("__id"), on="__id", how="left_anti")
                  .select("__id",
                          F.lit(None).cast("long").alias("__root"),
                          F.lit(None).cast("int").alias("__depth")))
    out = resolved.unionByName(unresolved)
    return out.select(F.col("__id").alias(id_col),
                      F.col("__root").cast("long").alias("root_id"),
                      F.col("__depth").cast("int").alias("depth"))
