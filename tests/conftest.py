from __future__ import annotations

import pytest

from wp_etl_migration_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "parity: Spark-vs-DuckDB oracle parity rows (the suite's "
        "largest single block, ~110 queries — run them split across "
        "processes with PARITY_SHARD=i/N, or exclude with "
        '-m "not parity")')


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark("wp-etl-tests", master="local[8]",
                  **{"spark.sql.warehouse.dir": warehouse})
    yield s
