"""Dot-prefixed column-namespace operators (SURVEY §1.3, §2.3 P2/P3/P5).

The reference's core data-model convention: flat column names carry a
``prefix.`` role namespace (``legacy.*``, ``post.*``, ``meta.*``, ``tax.*``,
``ledger.*`` …). These operators reproduce it with flat Spark columns whose
names contain dots (addressed with backticks internally — callers never
need to).

- ``prefix_all``     ≙ RenameWithPrefixAllEntriesTransformer.php:34-44
- ``select_prefix``  ≙ SelectPrefixTransformer.php:31-68
- ``strip_prefix``   ≙ the strip branch of SelectPrefixTransformer.php:55-63
- ``unpack_prefixed``≙ BaseLoader.php:109-177 (reduce_row_on_prefix +
  unpack_recursive — remaining dots become nested structs)

All are pure projections: Catalyst collapses them into the scan's column
pruning, so at 100 TB a prefix-select means the parquet reader never
materializes the other namespaces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bt(name: str):
    """Column reference for a (possibly dotted) flat column name."""
    return F.col("`" + name + "`")


def prefix_all(df: DataFrame, prefix: str) -> DataFrame:
    """Prepend ``prefix`` to every column name (e.g. ``legacy.``)."""
    return df.toDF(*[prefix + c for c in df.columns])


def select_prefix(df: DataFrame, prefixes: str | Sequence[str],
                  strip: bool | None = None) -> DataFrame:
    """Keep only columns whose name starts with any of ``prefixes``.

    ``strip`` removes the prefix from the kept names; by default it strips
    exactly when a single prefix was given (the reference's behavior for
    sink pre-filters, Load AdapterFactory.php:157-170).
    """
    if isinstance(prefixes, str):
        prefixes = [prefixes]
    if strip is None:
        strip = len(prefixes) == 1
    kept = [c for c in df.columns
            if any(c.startswith(p) for p in prefixes)]
    out = df.select(*[_bt(c) for c in kept])
    if strip:
        def _strip(c: str) -> str:
            for p in prefixes:
                if c.startswith(p):
                    return c[len(p):]
            return c
        out = out.toDF(*[_strip(c) for c in kept])
    return out


def strip_prefix(df: DataFrame, prefix: str) -> DataFrame:
    """Remove ``prefix`` from any column name that carries it."""
    return df.toDF(*[c[len(prefix):] if c.startswith(prefix) else c
                     for c in df.columns])


def unpack_prefixed(df: DataFrame, prefix: str) -> DataFrame:
    """Project ``prefix.*`` columns, strip the prefix, and rebuild any
    remaining dotted names as nested structs.

    ``media.featured.url`` + ``media.featured.alt`` under prefix
    ``media.`` → struct column ``featured{url, alt}``.
    """
    scoped = select_prefix(df, prefix, strip=True)
    flat = [c for c in scoped.columns if "." not in c]
    nested: dict[str, list[str]] = {}
    for c in scoped.columns:
        if "." in c:
            head, _, _ = c.partition(".")
            nested.setdefault(head, []).append(c)
    cols = [_bt(c) for c in flat]
    for head, members in nested.items():
        cols.append(
            F.struct(*[_bt(m).alias(m.partition(".")[2]) for m in members]
                     ).alias(head))
    return scoped.select(*cols)
