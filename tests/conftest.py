import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_SPARK_HOLDER: dict = {}


@pytest.fixture(scope="session")
def spark():
    from stac_populator_spark.session import get_spark

    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    _SPARK_HOLDER["spark"] = s
    yield s
