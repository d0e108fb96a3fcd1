"""MySQL default-ci-collation emulation (functions/collation.py).

The reference delegates analyst SQL to a ci-collated MySQL server
(reference src/loader.py:231): WHERE equality, DISTINCT, GROUP BY and
ORDER BY all fold case there. ``register_views(case_insensitive=True)``
re-types every string column to UTF8_LCASE so unmodified analyst SQL
gets the same answers; the default stays binary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import register_views
from sheetsetl_spark.functions.collation import ci_collate_strings
from sheetsetl_spark.functions.mysql_compat import mysql_file_to_spark_sql

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def mixed_case(spark):
    df = spark.createDataFrame(
        [("Smith", "NY"), ("smith", "ny"), ("SMITH", "NY"), ("Jones", "LA")],
        "name string, city string",
    )
    return df


def test_ci_collate_strings_folds_compare_group_distinct_order(mixed_case):
    ci = ci_collate_strings(mixed_case)
    # type annotation only: non-string columns untouched, names preserved
    assert [f.name for f in ci.schema.fields] == ["name", "city"]
    assert ci.filter(F.col("name") == "SMITH").count() == 3
    assert ci.select("name").distinct().count() == 2
    grouped = {
        r["k"]: r["c"]
        for r in ci.groupBy(F.lower("name").alias("k"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert grouped == {"smith": 3, "jones": 1}
    # GROUP BY on the collated column itself folds to the same 2 groups
    assert ci.groupBy("name").count().count() == 2
    # binary frame unchanged: 4 distinct names
    assert mixed_case.select("name").distinct().count() == 4


def test_ci_collate_no_string_columns_is_identity(spark):
    df = spark.range(3)
    assert ci_collate_strings(df) is df


def test_register_views_ci_mode_runs_unmodified_analyst_sql(spark):
    """End-to-end: an analyst's MySQL file (ci server semantics assumed)
    over ci-registered views gives the folded answer; the same file over
    default binary views gives the unfolded one."""
    sql_file = (
        "USE analytics;\n"
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = 'building';"
    )
    translated = mysql_file_to_spark_sql(sql_file)

    register_views(spark, SF_SMALL)
    binary_n = spark.sql(translated).collect()[0]["n"]
    assert binary_n == 0  # fixture segments are uppercase

    register_views(spark, SF_SMALL, case_insensitive=True)
    ci_n = spark.sql(translated).collect()[0]["n"]
    assert ci_n > 0
    # the folded count equals the explicit-case query's
    want = spark.sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = 'BUILDING'"
    ).collect()[0]["n"]
    assert ci_n == want
    # restore binary views for any later test using the same session
    register_views(spark, SF_SMALL)


def test_binary_override_stays_case_sensitive_in_ci_mode(spark):
    """MySQL's unary BINARY is the analyst's explicit case-SENSITIVE
    override on a ci server. The translator wraps simple operands in
    COLLATE(x, 'UTF8_BINARY') — a no-op over default binary views, but
    over ci views it restores binary comparison, exactly the server
    behavior."""
    from sheetsetl_spark.functions.mysql_compat import mysql_to_spark_sql

    sql = mysql_to_spark_sql(
        "SELECT COUNT(*) AS n FROM customer WHERE BINARY c_mktsegment = 'building'"
    )
    assert "COLLATE(c_mktsegment, 'UTF8_BINARY')" in sql
    register_views(spark, SF_SMALL, case_insensitive=True)
    assert spark.sql(sql).collect()[0]["n"] == 0  # override beats ci views
    plain = mysql_to_spark_sql(
        "SELECT COUNT(*) AS n FROM customer WHERE c_mktsegment = 'building'"
    )
    assert spark.sql(plain).collect()[0]["n"] > 0
    register_views(spark, SF_SMALL)  # restore binary views
    assert spark.sql(sql).collect()[0]["n"] == 0


def test_ci_order_by_folds_case(spark):
    df = spark.createDataFrame(
        [("b",), ("A",), ("a",), ("B",)], "v string"
    )
    ci = ci_collate_strings(df)
    got = [r["v"].lower() for r in ci.orderBy("v", F.lower("v")).collect()]
    assert got == ["a", "a", "b", "b"]
