"""DataFrame → DataFrame operators (SURVEY §2.3–§2.7 + LLM-pipeline ops)."""

from wp_etl_migration_spark.operators.prefix import (  # noqa: F401
    prefix_all,
    select_prefix,
    strip_prefix,
    unpack_prefixed,
)
from wp_etl_migration_spark.operators.rename import (  # noqa: F401
    snake_case,
    scrub_name,
    rename_snake_scrub,
    rename_regex_replace,
)
from wp_etl_migration_spark.operators.cleaning import (  # noqa: F401
    string_to_null,
)
from wp_etl_migration_spark.operators.melt import melt  # noqa: F401
from wp_etl_migration_spark.operators.merge import (  # noqa: F401
    merge_upsert,
    cascaded_lookup,
)
from wp_etl_migration_spark.operators.hierarchy import (  # noqa: F401
    resolve_paths,
)
