"""Date/time scalar functions (SURVEY §2.8 F5, F13–F15).

- ``normalize_datetime`` ≙ EntryNormalizer.php:18-29 (DateTime → ATOM/ISO
  string with configurable format)
- ``validate_date``      ≙ WPPostsLoader.php:254-269 (accept
  ``Y-m-d H:i:s`` exactly, else ISO-8601, else fallback)
- ``local_to_gmt``       ≙ WPPostsLoader.php:221-227 (``get_gmt_from_date``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: PHP DATE_ATOM ≙ ISO-8601 with offset; ``xxx`` (not ``XXX``, which
#: renders UTC as 'Z') yields the ATOM-style ``+00:00`` suffix.
ATOM_FORMAT = "yyyy-MM-dd'T'HH:mm:ssxxx"


def normalize_datetime(col: Column | str, fmt: str = ATOM_FORMAT) -> Column:
    """Format a timestamp column as a string (default ATOM/ISO-8601)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def validate_date(col: Column | str, fallback: Column | None = None) -> Column:
    """Parse ``yyyy-MM-dd HH:mm:ss`` exactly, else any ISO-8601-ish value,
    else fall back (reference falls back to ``current_time``)."""
    c = F.col(col) if isinstance(col, str) else col
    fb = fallback if fallback is not None else F.current_timestamp()
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(c),
        fb,
    )


def local_to_gmt(col: Column | str, tz: str) -> Column:
    """Reinterpret a local-time timestamp as being in ``tz`` and convert
    to UTC (``post_date`` → ``post_date_gmt``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_utc_timestamp(c, tz)
