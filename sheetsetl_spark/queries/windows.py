"""B-series tier 4a: window functions, top-N, sort/limit (SURVEY §2-B
B30-B36).

The reference's MySQL 5.7 users emulate these with variables/self-joins;
MySQL 8.0 has them natively — we implement the full Spark window surface.
Determinism: every ROW_NUMBER/NTILE window carries a unique tie-break key;
rank-family functions may use coarse (tied) keys because they are
rank-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query


@query(
    "b30_ranking_functions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROW_NUMBER() OVER w_total AS rn,
           RANK() OVER w_coarse AS rnk,
           DENSE_RANK() OVER w_coarse AS drnk,
           NTILE(4) OVER w_total AS quartile,
           ROUND(PERCENT_RANK() OVER w_coarse, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w_coarse, 6) AS cdist
    FROM customer
    WINDOW w_total AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
           w_coarse AS (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal / 1000) DESC)
    """,
)
def b30_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: ROW_NUMBER/RANK/DENSE_RANK/NTILE/PERCENT_RANK/CUME_DIST."""
    c = load_table(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_coarse = Window.partitionBy("c_mktsegment").orderBy(
        F.floor(F.col("c_acctbal") / 1000).desc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_coarse).alias("rnk"),
        F.dense_rank().over(w_coarse).alias("drnk"),
        F.ntile(4).over(w_total).alias("quartile"),
        F.round(F.percent_rank().over(w_coarse), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_coarse), 6).alias("cdist"),
    )


@query(
    "b31_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER w AS prev_value,
           LEAD(value, 2) OVER w AS next2_value,
           FIRST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           NTH_VALUE(event_type, 2) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def b31_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: LAG/LEAD/FIRST_VALUE/NTH_VALUE over an event-time window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value", 2).over(w).alias("next2_value"),
        F.first("event_type").over(w_full).alias("first_type"),
        F.nth_value("event_type", 2).over(w_full).alias("second_type"),
    )


@query(
    "b32_window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_spend
    FROM orders
    """,
)
def b32_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: ROWS/RANGE frames — running sums and moving averages. Sums use
    exact decimal accumulation so frame evaluation order is irrelevant."""
    o = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,6)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_3 = w.rowsBetween(-2, Window.currentRow)
    # RANGE frame: peers (same o_orderdate) aggregate together.
    w_range = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(price_dec).over(w_run).cast("double").alias("running_spend"),
        F.round(
            F.sum(price_dec).over(w_3).cast("double") / F.count("*").over(w_3), 6
        ).alias("moving_avg3"),
        F.sum(price_dec).over(w_range).cast("double").alias("range_spend"),
    )


@query(
    "b33_topn_per_group",
    oracle="""
    SELECT custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def b33_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: top-N per group (the MySQL 5.7 self-join idiom, done right)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "b34_multikey_sort_limit",
    oracle="""
    SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 200
    """,
)
def b34_multikey_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34/B36: multi-key ORDER BY + LIMIT — Spark plans
    TakeOrderedAndProject (no global sort materialization)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(200)
    )


@query(
    "b35_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def b35_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: LIMIT n OFFSET m over a total order (unique sort key)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@query(
    "b36_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def b36_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: ORDER BY ... LIMIT k top-k (TakeOrderedAndProject)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
