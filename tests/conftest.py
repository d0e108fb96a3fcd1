from __future__ import annotations

import pytest

from sheetsetl_spark.session import build_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="sheetsetl-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
