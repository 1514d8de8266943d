import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from knowledgegraphs_spark.session import get_spark

    s = get_spark("kg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
