import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SEQUIN_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from sequin_spark.session import get_spark

    s = get_spark("sequin_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: retraining/regeneration checks (minutes); included in the "
        "default run, deselectable with -m 'not slow'")
