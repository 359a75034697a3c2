"""Whole-frame cleaning operators.

``string_to_null`` ≙ StringToNullTransformer.php:43-55: every cell equal to
a sentinel string becomes NULL, across all (or the given) string columns.
Expressed as per-column NULLIF so it stays in codegen (``df.replace`` would
too, but NULLIF keeps the plan explicit and pushdown-friendly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def string_to_null(df: DataFrame, sentinel: str,
                   columns: Sequence[str] | None = None) -> DataFrame:
    """Replace cells equal to ``sentinel`` with NULL in string columns."""
    if columns is None:
        columns = [f.name for f in df.schema.fields
                   if isinstance(f.dataType, StringType)]
    targets = set(columns)
    return df.select(*[
        F.nullif(F.col("`" + c + "`"), F.lit(sentinel)).alias(c)
        if c in targets else F.col("`" + c + "`")
        for c in df.columns
    ])
