"""Scalar-function library (SURVEY §2.8 F1–F23).

Everything here is a ``Column``-in / ``Column``-out expression built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen; pandas
UDFs appear only where stated (HTML handling)."""

from wp_etl_migration_spark.functions.text import (  # noqa: F401
    to_slug,
    split_trim,
    nullif_value,
    sanitize_key,
    sanitize_title,
    sanitize_text_field,
    sanitize_email,
    absint,
    strip_all_tags,
    utf8_scrub,
)
from wp_etl_migration_spark.functions.dates import (  # noqa: F401
    normalize_datetime,
    validate_date,
    local_to_gmt,
)
from wp_etl_migration_spark.functions.numbers import (  # noqa: F401
    preserve_numeric_type,
    dec_sum,
    dec_avg,
)
from wp_etl_migration_spark.functions.templates import (  # noqa: F401
    substitute_placeholders,
)
from wp_etl_migration_spark.functions.html import (  # noqa: F401
    html_to_blocks,
    html_to_blocks_str,
    block_pattern_lookup,
)
