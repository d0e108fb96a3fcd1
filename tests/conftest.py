from __future__ import annotations

import os

import pytest

from sheetsetl_spark.session import build_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"

# Test sessions work at sf0.001/sf0.01 and never need the bench session's
# cores-scaled heap (12-16g — session.py). Historical motivation (r11):
# with the then-default Xms = Xmx + AlwaysPreTouch, every concurrent test
# JVM committed its whole heap at startup, so three fast-gate shards at
# the then-47g machine default exceeded physical RAM and the third JVM
# died before opening its gateway (JAVA_GATEWAY_EXITED, 337 setup
# errors). The pin is opt-in now, but a small fixed heap still keeps
# shards cheap, deterministic, and start-up fast; the env override wins
# for anyone who needs more.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


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
