import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

# Reference fixture payloads (read-only test data; used for golden-fact
# parity checks). Tests that need them skip cleanly when absent.
REFERENCE_FIXTURES = os.environ.get(
    "AUTH2WD_REFERENCE_FIXTURES", "/root/reference/test_data/fixtures"
)


def fixture_path(name: str) -> str:
    return os.path.join(REFERENCE_FIXTURES, name)


def read_fixture(name: str) -> str:
    path = fixture_path(name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture corpus not available: {path}")
    with open(path, encoding="utf-8") as fh:
        return fh.read()


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("auth2wd-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
