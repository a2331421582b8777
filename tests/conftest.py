import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_TESTS = "/root/reference/tests"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def reference_fixture(name: str) -> bytes:
    path = os.path.join(REFERENCE_TESTS, name)
    if not os.path.exists(path):
        pytest.skip(f"reference fixture {name} not available")
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("docwire_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
