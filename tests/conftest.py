import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from datacube_core_spark.session import get_spark

    s = get_spark(app_name="dcs-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
