"""Text/string scalar functions (reference: SURVEY §2.8).

Re-expressions of the reference's transform + sanitize family as native
Column expressions (JVM-side, codegen-friendly — no Python in the hot
path):

- ``to_slug``        ≙ ToSlug.php:34-46 (WP ``sanitize_title``)
- ``split_trim``     ≙ Explode.php:37-49 (``to_explode`` DSL fn — returns
                       the array; no row fan-out)
- ``nullif_value``   ≙ CompareSetNull.php:38-50
- ``string_to_null`` ≙ StringToNullTransformer.php:43-55 (DataFrame-level,
                       see operators.cleaning)
- sanitize family    ≙ WPPostsLoader.php:163-246 / WPUserLoader.php:140-216 /
                       WPTermsLoader.php:229-291 (WP sanitize_* semantics)
- ``utf8_scrub``     ≙ WPTermsLoader.php:242 (iconv //IGNORE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_slug(col: Column | str) -> Column:
    """Slugify: lowercase, non-alphanumeric runs → '-', trim '-'.

    Matches WP ``sanitize_title`` for ASCII input; accent folding for
    non-ASCII is approximated by dropping non-alphanumerics (the reference
    strips accents via ``remove_accents`` — for the synthetic ASCII data
    the two agree).
    """
    c = F.col(col) if isinstance(col, str) else col
    slug = F.regexp_replace(F.lower(F.trim(c)), r"[^a-z0-9]+", "-")
    return F.regexp_replace(slug, r"^-+|-+$", "")


def split_trim(col: Column | str, delim: str = ",") -> Column:
    """Split on a literal delimiter and trim each piece → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    # F.split takes a regex; escape the literal delimiter.
    import re as _re

    return F.transform(F.split(c, _re.escape(delim)), lambda x: F.trim(x))


def nullif_value(col: Column | str, value) -> Column:
    """value-equal cells → NULL, everything else unchanged (NULLIF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(value))


def sanitize_key(col: Column | str) -> Column:
    """WP ``sanitize_key``: lowercase, keep only ``[a-z0-9_-]``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"[^a-z0-9_\-]", "")


def sanitize_title(col: Column | str) -> Column:
    """Alias of :func:`to_slug` (WP uses sanitize_title for slugs)."""
    return to_slug(col)


def strip_all_tags(col: Column | str) -> Column:
    """WP ``wp_strip_all_tags``: drop <script>/<style> blocks, strip tags,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    no_blocks = F.regexp_replace(
        c, r"(?is)<(script|style)[^>]*>.*?</\1>", "")
    no_tags = F.regexp_replace(no_blocks, r"<[^>]*>", "")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def sanitize_text_field(col: Column | str) -> Column:
    """WP ``sanitize_text_field``: strip tags, octets, control chars,
    collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    no_tags = F.regexp_replace(c, r"<[^>]*>", "")
    no_octets = F.regexp_replace(no_tags, r"%[a-fA-F0-9]{2}", "")
    no_ctrl = F.regexp_replace(no_octets, r"[\x00-\x1F\x7F]", "")
    return F.trim(F.regexp_replace(no_ctrl, r"[ \t]+", " "))


def sanitize_email(col: Column | str) -> Column:
    """WP ``sanitize_email`` (subset): strip characters not legal in an
    email; null out values that do not look like ``local@domain.tld``."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, r"[^a-zA-Z0-9.!#$%&'*+/=?^_`{|}~@\-]", "")
    ok = cleaned.rlike(r"^[^@]+@[^@]+\.[^@]{2,}$")
    return F.when(ok, cleaned).otherwise(F.lit(None))


def absint(col: Column | str) -> Column:
    """WP ``absint``: absolute integer value (non-numeric → 0)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.abs(F.coalesce(c.try_cast("long"), F.lit(0)))


def utf8_scrub(col: Column | str) -> Column:
    """Drop bytes that are not valid UTF-8 (iconv //IGNORE semantics).

    Spark strings are already UTF-16 internally; invalid source bytes
    surface as U+FFFD after decode — strip those plus raw control bytes.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[�\x00-\x08\x0b\x0c\x0e-\x1f]", "")
