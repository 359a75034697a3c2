"""Wide→long melt (SURVEY §2.2 L6: the meta-sink's EAV shape).

≙ WPPostMetaLoader.php:86-141: each ``meta.<key>[.<mode>]`` column of a row
becomes one ``(id, meta_key, meta_value, mode)`` long row.

Spark-first: a single generator expression via ``stack`` — one pass over
the input, no shuffle, scales linearly. (``df.melt`` exists in Spark 3.4+;
we use it directly and layer the meta-key/mode parsing on top.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
         key_col: str = "key", value_col: str = "value") -> DataFrame:
    """Unpivot ``value_cols`` into (key, value) long rows, keeping
    ``id_cols``. Values are cast to string (EAV payload column)."""
    # df.melt resolves dotted names as nested fields, so emit an explicit
    # stack() generator with backticked references instead — same plan
    # shape (a single Generate, no shuffle).
    pairs = ", ".join(f"'{c}', string(`{c}`)" for c in value_cols)
    gen = (f"stack({len(value_cols)}, {pairs}) "
           f"as ({key_col}, {value_col})")
    return df.select(*[F.col("`" + c + "`") for c in id_cols], F.expr(gen))


def melt_meta(df: DataFrame, id_cols: Sequence[str],
              prefix: str = "meta.") -> DataFrame:
    """Melt ``meta.<key>[.<mode>]`` columns → (ids…, meta_key, mode,
    meta_value); mode ∈ {add, update}, defaulting to update
    (≙ WPPostMetaLoader.php:114-131)."""
    meta_cols = [c for c in df.columns if c.startswith(prefix)]
    long = melt(df, id_cols, meta_cols, key_col="column", value_col="meta_value")
    stripped = F.expr(f"substring(column, {len(prefix) + 1})")
    has_mode = stripped.rlike(r"\.(add|update)$")
    key = F.when(has_mode, F.regexp_replace(stripped, r"\.(add|update)$", "")
                 ).otherwise(stripped)
    mode = F.when(has_mode, F.regexp_extract(stripped, r"\.(add|update)$", 1)
                  ).otherwise(F.lit("update"))
    return (long
            .withColumn("meta_key", key)
            .withColumn("mode", mode)
            .drop("column")
            .select(*id_cols, "meta_key", "mode", "meta_value"))
