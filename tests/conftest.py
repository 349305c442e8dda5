from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_location_addressing_feature_service_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # small-core session for tests: startup speed over parallelism
    s = get_spark(app_name="cam-etl-tests", cpus=os.environ.get("SPARK_TEST_CPUS", "4"))
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
