"""B-series tier 4b: set operations, subqueries, CTEs (SURVEY §2-B B37-B42).

Subquery/CTE queries run through ``spark.sql`` over the registered temp
views — the exact Spark-native analog of the reference shipping raw SQL
text to MySQL (/root/reference/src/loader.py:231): the SQL string is the
interface, Catalyst decorrelates and plans it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table, register_views
from sheetsetl_spark.queries import query


@query(
    "b37_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    """,
)
def b37_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: UNION ALL (bag union, no shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")).unionAll(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src"))
    )


@query(
    "b37b_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def b37b_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: UNION (dedup) — union + distinct hash agg."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "b38_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 4000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 4000
    """,
)
def b38_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 4000)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4000)
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "b39_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_nationkey < 20
    """,
)
def b39_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: EXCEPT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 20)
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "b40_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
)
def b40_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40: uncorrelated scalar subquery in WHERE."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
        """
    )


@query(
    "b41_correlated_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def b41_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (often better than the MySQL 5.7 server it replaces)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "b42_cte",
    oracle="""
    WITH nation_counts AS (
      SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt FROM customer GROUP BY c_nationkey
    ), enriched AS (
      SELECT n.n_name, n.n_regionkey, nc.cust_cnt
      FROM nation_counts nc JOIN nation n ON nc.nk = n.n_nationkey
    )
    SELECT r.r_name, CAST(SUM(e.cust_cnt) AS BIGINT) AS total_customers,
           COUNT(*) AS num_nations
    FROM enriched e JOIN region r ON e.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def b42_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: chained WITH CTEs (native in spark.sql)."""
    register_views(spark, sf_dir, ("customer", "nation", "region"))
    return spark.sql(
        """
        WITH nation_counts AS (
          SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt FROM customer GROUP BY c_nationkey
        ), enriched AS (
          SELECT n.n_name, n.n_regionkey, nc.cust_cnt
          FROM nation_counts nc JOIN nation n ON nc.nk = n.n_nationkey
        )
        SELECT r.r_name, CAST(SUM(e.cust_cnt) AS BIGINT) AS total_customers,
               COUNT(*) AS num_nations
        FROM enriched e JOIN region r ON e.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


_B18B_SQL = """
    SELECT 'with_null' AS variant, COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT NULLIF(o_custkey, 7) FROM orders)
    UNION ALL
    SELECT 'no_null' AS variant, COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey <> 7)
    """


@query("b18b_not_in_null_semantics", oracle=_B18B_SQL)
def b18b_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: the NOT IN + NULL trap — standard 3VL makes NOT IN against a
    set containing NULL never-true (count 0), while the NULL-free variant
    counts normally. Spark, MySQL and DuckDB all implement the standard;
    the pair of counts proves we reproduce it rather than the left-anti
    shortcut (which would wrongly return rows in the with_null branch)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_B18B_SQL)


_B27B_SQL = """
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
           GROUPING(c_mktsegment) AS g_seg, GROUPING(c_nationkey) AS g_nat
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """


@query("b27b_grouping_sets", oracle=_B27B_SQL)
def b27b_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: explicit GROUPING SETS (beyond b27's CUBE) with GROUPING()
    markers distinguishing the aggregation level of each row."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_B27B_SQL)
