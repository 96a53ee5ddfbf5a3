import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from iceberg_rust_archive_spark.session import get_spark
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from iceberg_rust_archive_spark.session import load_tables
    return load_tables(spark, SF_DIR)
