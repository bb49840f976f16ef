import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentick_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(app_name="opentick_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def engine(spark, tmp_path):
    from opentick_spark.engine import Engine

    return Engine(spark, str(tmp_path / "warehouse"))


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
