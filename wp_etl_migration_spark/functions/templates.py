"""``%%placeholder%%`` template substitution (SURVEY §2.8 F19).

≙ WordPressMediaLoader.php:96-148: after the media stage resolves
attachments, every string column may contain ``%%media.key.attachment_id%%``
tokens that must be replaced from a per-row map of resolved values.

Spark-first shape: the resolved values live in a ``map<string,string>``
column produced by the media-resolution join; substitution is a pure
expression over (string col, map col). We stay JVM-side by iterating the
*statically known* key set (placeholder keys are column-derived, hence
known at plan time) — one ``regexp_replace``/``replace`` per key, chained.
For a dynamic key set, ``substitute_placeholders_dynamic`` uses
``F.reduce`` over ``map_keys``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def substitute_placeholders(col: Column | str, values: Column | str,
                            keys: Iterable[str]) -> Column:
    """Replace ``%%key%%`` tokens in ``col`` from map column ``values``.

    Unresolved keys (absent from the map) are replaced with '' — the
    reference substitutes empty string on failure
    (WordPressMediaLoader.php:134-148).
    """
    c = F.col(col) if isinstance(col, str) else col
    m = F.col(values) if isinstance(values, str) else values
    out = c
    for key in keys:
        token = f"%%{key}%%"
        out = F.replace(out, F.lit(token),
                        F.coalesce(m.getItem(key), F.lit("")))
    return out


def substitute_placeholders_dynamic(col: Column | str,
                                    values: Column | str) -> Column:
    """Replace every ``%%k%%`` for each ``k`` in the map column's keys.

    Fully dynamic variant using higher-order ``F.reduce`` over
    ``map_keys`` — still JVM-side (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.col(values) if isinstance(values, str) else values
    return F.reduce(
        F.map_keys(m),
        c,
        lambda acc, k: F.replace(
            acc, F.concat(F.lit("%%"), k, F.lit("%%")),
            F.coalesce(m.getItem(k), F.lit(""))),
    )
