"""Every oracle-declared query must match DuckDB exactly — the local
mirror of the driver's CORRECTNESS gate (sf0.001 for speed; the driver
runs sf0.01, covered by the slow marker / pre-commit full run)."""

from __future__ import annotations

import os

import pytest

from sheetsetl_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_MEDIUM, SF_SMALL
from tests.oracle import compare

SF_DIR = os.environ.get("SHEETSETL_TEST_SF", SF_SMALL)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    compare(QUERIES[name](spark, SF_DIR), ORACLES[name], SF_DIR)


# Deliberately kept although it currently parametrizes over the EMPTY
# set (289/289 registry queries carry DuckDB oracles): it is the guard
# that fires the moment someone registers a query WITHOUT an oracle, so
# the weaker rows-only contract still gets a determinism check.
@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops: deterministic row count across two runs."""
    n1 = QUERIES[name](spark, SF_DIR).count()
    n2 = QUERIES[name](spark, SF_DIR).count()
    assert n1 == n2


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_rows_only_queries_are_deterministic(spark):
    """The queries without DuckDB oracles (genuinely approximate sketches)
    must still be run-to-run deterministic — the driver's rows-only check
    plus this guarantees stable output."""
    from sheetsetl_spark.queries import ORACLES, QUERIES

    for name in sorted(set(QUERIES) - set(ORACLES)):
        a = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        b = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        assert a == b and len(a) > 0, name


def test_native_recursive_cte_matches_fixpoint_emulation(spark):
    """b42c (Spark 4.1 native WITH RECURSIVE) and b42b (driver fixpoint
    loop, functions/iterative.py) walk the same nation-derived graph:
    identical results pin the emulation's semantics to the engine's."""
    native = sorted(
        map(tuple, QUERIES["b42c_recursive_native"](spark, SF_DIR).collect())
    )
    fixpoint = sorted(
        map(tuple, QUERIES["b42b_recursive_closure"](spark, SF_DIR).collect())
    )
    assert native == fixpoint
