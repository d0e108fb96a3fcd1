from __future__ import annotations

import pytest

from sheetsetl_spark.session import build_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[8]/8 shuffle partitions: measured for the fast-gate budget
    # (README) — local[4] put the 589-test core at 5:53; the extra cores
    # cut multi-partition oracle actions without changing any plan shape
    # the tests assert (the only partition-count assertion counts CSV
    # input files, not cores).
    spark = build_session(app_name="sheetsetl-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
