import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from solr_sematic_importer_spark.session import get_spark

    s = get_spark("engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf0001():
    return f"{TESTDATA}/sf0.001"


@pytest.fixture(scope="session")
def sf001():
    return f"{TESTDATA}/sf0.01"
