"""Sources (SURVEY §2.1 S1–S11)."""

from wp_etl_migration_spark.sources.files import (  # noqa: F401
    from_csv,
    from_json,
    from_xml,
    from_parquet,
)
from wp_etl_migration_spark.sources.tables import (  # noqa: F401
    Tables,
    load_table,
)
from wp_etl_migration_spark.sources.jdbc import (  # noqa: F401
    from_jdbc,
    wp_jdbc_tables,
)
from wp_etl_migration_spark.sources.memory import from_rows  # noqa: F401
from wp_etl_migration_spark.sources.rss import (  # noqa: F401
    from_rss,
    from_rss_pages,
)
