"""Canonical TPC-H Q2/Q9/Q11/Q16/Q20 over the synthesized partsupp:
the SAME SQL text runs on Spark and DuckDB and must agree exactly
(rows, schema-by-name, values) — the strongest possible cross-engine
check, since there is zero translation surface. Local-gated (the driver
fixture/view set has no partsupp; see module docstring)."""

from __future__ import annotations

import pytest

from sheetsetl_spark.queries.tpch_partsupp import (
    CANONICAL_SQL,
    PARTSUPP_SQL,
    run_canonical,
    write_partsupp_parquet,
)
from tests.conftest import SF_SMALL
from tests.oracle import compare


def test_partsupp_derivation_shape(spark):
    from sheetsetl_spark.catalog import register_views

    register_views(spark, SF_SMALL)
    ps = spark.sql(PARTSUPP_SQL)
    n_part = spark.table("part").count()
    assert ps.count() == 4 * n_part
    # (partkey, suppkey) is a primary key; cost/qty in the documented domains
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 4 * n_part
    row = ps.selectExpr(
        "min(ps_supplycost) AS lo", "max(ps_supplycost) AS hi",
        "min(ps_availqty) AS qlo", "max(ps_availqty) AS qhi",
    ).collect()[0]
    assert 1.0 <= row["lo"] and row["hi"] <= 1000.99
    assert 1 <= row["qlo"] and row["qhi"] <= 9999


@pytest.mark.parametrize("name", sorted(CANONICAL_SQL))
def test_canonical_matches_duckdb_same_text(spark, name):
    df = run_canonical(spark, SF_SMALL, name)
    assert df.count() > 0, f"{name}: canonical query returned no rows"
    compare(df, CANONICAL_SQL[name], SF_SMALL)


def test_write_partsupp_parquet(spark, tmp_path):
    out = str(tmp_path / "partsupp")
    write_partsupp_parquet(spark, SF_SMALL, out)
    ps = spark.read.parquet(out)
    assert ps.count() == 4 * spark.table("part").count()
    assert set(ps.columns) == {
        "ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost",
    }
