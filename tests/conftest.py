from __future__ import annotations

import pytest

from flink_snappydata_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="fss-tests", shuffle_partitions=8)
    yield spark
