"""Numeric helpers.

``preserve_numeric_type`` ≙ WPPostMetaLoader.php:177-205 (numeric string →
int when integral else float, non-numerics untouched).

``dec_sum`` / ``dec_avg`` are the engine's *deterministic aggregation*
discipline: floating-point SUM is order-dependent, so on a 1000-executor
cluster (and versus a single-node oracle) the low bits wander. Casting to
DECIMAL first makes the aggregation exact and order-independent — the
result is bit-identical no matter the partitioning — and the final cast
back to DOUBLE is a single well-defined conversion. Cost is negligible
(decimal sum is still whole-stage-codegen'd) and it buys reproducibility
at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def preserve_numeric_type(col: Column | str) -> Column:
    """Numeric-looking strings → canonical numeric string form.

    Integral strings lose nothing; float-like strings stay float-formatted;
    anything else passes through unchanged. (String-typed output keeps the
    EAV meta column homogeneous, like WP meta_value.)
    """
    c = F.col(col) if isinstance(col, str) else col
    is_int = c.rlike(r"^-?\d+$")
    is_float = c.rlike(r"^-?\d*\.\d+$")
    return (
        F.when(is_int, c.cast("long").cast("string"))
        .when(is_float, c.cast("double").cast("string"))
        .otherwise(c)
    )


def dec_sum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM: cast to DECIMAL(30,scale), sum exactly,
    return DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG via exact decimal sum / count, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
    return total / F.count(c)
