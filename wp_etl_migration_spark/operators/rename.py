"""Column-name normalization (SURVEY §2.3 P4).

≙ DataNormalizer.php:32-53 (``renameAllStyle('snake')`` then regex-scrub of
control/non-ASCII bytes from column names) and
RenameRegexReplaceAllEntriesTransformer.php:38-48.

Pure renames — zero-cost at execution (names live only in the plan).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def snake_case(name: str) -> str:
    """``Article Title`` → ``article_title``; camelCase → camel_case."""
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name)
    s = re.sub(r"[\s\-]+", "_", s.strip())
    s = re.sub(r"_+", "_", s)
    return s.lower()


def scrub_name(name: str) -> str:
    """Delete control and non-ASCII bytes from a column name
    (≙ the ``/[\\x00-\\x1F\\x80-\\xFF]/`` scrub)."""
    return re.sub(r"[^\x20-\x7E]", "", name)


def rename_snake_scrub(df: DataFrame) -> DataFrame:
    """snake_case + scrub every column name."""
    return df.toDF(*[scrub_name(snake_case(c)) for c in df.columns])


def rename_regex_replace(df: DataFrame, pattern: str,
                         replacement: str = "") -> DataFrame:
    """Apply a regex replacement to every column name."""
    rx = re.compile(pattern)
    return df.toDF(*[rx.sub(replacement, c) for c in df.columns])
