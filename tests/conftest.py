import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from packages_sgml_spark.spark.session import get_spark
    s = get_spark(app="tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    from packages_sgml_spark.spark.queries import ensure_workers
    ensure_workers(s)
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running launch tests (spark-submit)")
