"""X-series TPC-H pack: the canonical warehouse query shapes the
reference's MySQL analysts write every day (arbitrary SELECTs delegated
via /root/reference/src/loader.py:231), adapted to the fixture schema
(no partsupp / commitdate / shipmode columns) and hash-checked against
DuckDB like every other registry entry.

These complement the per-operator b-series rows with REALISTIC
composites: multi-way join funnels into aggregation, correlated EXISTS,
disjunctive pushdown predicates, conditional aggregation, top-k over a
computed measure. Plan posture at 100 TB: dimensions broadcast
(customer/supplier/nation/region/part at fixture ratios), fact-fact
joins shuffle on the join key once, all float measures use the exact
DECIMAL accumulation contract from queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import dsum, query


def _dsum(col: Column, alias: str) -> Column:
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def _ntz(s: str) -> Column:
    return F.lit(s).cast("timestamp_ntz")


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "x14_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum(_REV, "revenue")},
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def x14_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: segment-filtered customer x orders x lineitem funnel,
    revenue per urgent order, top 10. Customer side broadcasts; the
    orders–lineitem join is the one shuffle."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ntz("1996-03-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ntz("1996-03-15"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(_rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "x15_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def x15_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: shipdate > orderdate stands in for the missing
    commitdate lag): correlated EXISTS as a semi-join with a non-equi
    residual — the shuffle stays keyed on the equi component."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01")) & (F.col("o_orderdate") < _ntz("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "x16_tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dsum(_REV, "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def x16_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: six-way star-plus-snowflake join, revenue by nation where
    customer and supplier share the nation. All dimensions broadcast;
    lineitem shuffles once on l_orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01")) & (F.col("o_orderdate") < _ntz("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(_dsum(_rev(), "revenue"))
    )


@query(
    "x17_tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def x17_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter-and-aggregate — every predicate pushes to
    the parquet scan, the global agg is one partial+final pair."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01"))
        & (F.col("l_shipdate") < _ntz("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "x18_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {dsum(_REV, "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def x18_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, top 20 — join
    funnel + grouped top-k over a computed measure."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01")) & (F.col("o_orderdate") < _ntz("1996-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "x19_tpch_q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def x19_tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (l_linestatus stands in for the missing shipmode):
    conditional aggregation over a fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01")) & (F.col("l_shipdate") < _ntz("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "x20_tpch_q14_promo_effect",
    oracle=f"""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                   THEN CAST({_REV} AS DECIMAL(18,6))
                                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def x20_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional ratio aggregate over
    a broadcast part join; both sums use exact decimal accumulation so
    the ratio is partitioning-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-09-01")) & (F.col("l_shipdate") < _ntz("1996-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev_dec = _rev().cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev_dec).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "x21_tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum(_REV, "revenue")}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def x21_tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three-armed disjunctive predicate across both join
    sides — the common-subexpression (l_partkey = p_partkey) stays the
    equi key, the disjunction is the residual filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    arm = lambda brand, lo_sz, hi_sz, lo_q, hi_q: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(lo_sz, hi_sz)
        & (F.col("l_quantity") >= lo_q)
        & (F.col("l_quantity") <= hi_q)
    )
    return j.filter(
        arm("Brand#12", 1, 5, 1, 11) | arm("Brand#23", 1, 10, 10, 20) | arm("Brand#34", 1, 15, 20, 30)
    ).agg(_dsum(_rev(), "revenue"), F.count("*").alias("n_lines"))


@query(
    "x23_tpch_q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             YEAR(l_shipdate) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def x23_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year —
    the two-nation filter lands on broadcast dimension joins, so the
    fact side is pre-filtered before its single shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01")) & (F.col("l_shipdate") < _ntz("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(_rev(), "revenue"))
    )


@query(
    "x24_tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                               THEN CAST(volume AS DECIMAL(18,6))
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT YEAR(o_orderdate) AS o_year, {_REV} AS volume, n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def x24_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market by year — a
    conditional ratio over an eight-table join; every dimension
    broadcasts, both sums are exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01")) & (F.col("o_orderdate") < _ntz("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    vol_dec = _rev().cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r["r_regionkey"])
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol_dec).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol_dec).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "x25_tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def x25_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer-count histogram by order count — left join so
    zero-order customers are counted, then a second tiny aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "x26_tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {dsum(_REV, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def x26_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — scalar
    MAX subquery against a derived revenue view; the decimal-sum doubles
    are bit-identical across engines, so the equality filter is safe."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01")) & (F.col("l_shipdate") < _ntz("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_rev(), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "x27_tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS t_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(l_quantity)) AS threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON p_partkey = t_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < threshold
    """,
)
def x27_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-average-quantity orders of one brand
    — the correlated AVG subquery decorrelates into a per-part aggregate
    joined back (broadcast: one row per part)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("threshold")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(thresh), li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 6
            ).alias("avg_yearly")
        )
    )


@query(
    "x28_tpch_q18_large_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           {dsum("l_quantity", "total_qty")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 170
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def x28_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with large-volume orders — HAVING subquery as
    a semi-join of orders against the qty aggregate, then the detail
    re-aggregation and top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("__q"))
        .filter(F.col("__q") > 170)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(big, o["o_orderkey"] == F.col("big_orderkey"), "left_semi")
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "x31_tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_price,
             s_acctbal, s_name, n_name,
             MIN(c.unit_price) OVER (PARTITION BY c.l_partkey) AS best_price
      FROM cost c
      JOIN supplier ON c.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name,
           p_partkey AS partkey, p_name, unit_price
    FROM eu
    JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'SMALL' AND p_size < 10 AND unit_price = best_price
    ORDER BY s_acctbal DESC, n_name, s_name, partkey
    LIMIT 100
    """,
)
def x31_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: observed lineitem unit price stands in for the
    missing partsupp.ps_supplycost): for every small European-supplied
    part, the supplier(s) quoting the minimum unit price. The correlated
    MIN subquery becomes a window MIN over the part key — one shuffle on
    l_partkey for the cost aggregate, dims broadcast, and the window
    reuses the aggregate's partitioning. Unit prices are compared as raw
    IEEE doubles: both engines derive them from the same division and
    MIN picks an element, so equality is exact with no accumulation
    order to stabilize."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") < 10)
    )
    from pyspark.sql import Window

    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    eu_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu = cost.join(F.broadcast(eu_supp), cost["l_suppkey"] == F.col("s_suppkey")).withColumn(
        "best_price", F.min("unit_price").over(Window.partitionBy("l_partkey"))
    )
    return (
        eu.filter(F.col("unit_price") == F.col("best_price"))
        .join(F.broadcast(p), eu["l_partkey"] == p["p_partkey"])
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").alias("partkey"), "p_name", "unit_price",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "partkey")
        .limit(100)
    )


@query(
    "x32_tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS INT) AS o_year,
           {dsum("l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity", "profit")}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, YEAR(o_orderdate)
    ORDER BY n_name, o_year DESC
    """,
)
def x32_tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: 0.6 * p_retailprice stands in for the missing
    partsupp.ps_supplycost): profit by supplier nation and order year for
    red parts. The part filter broadcasts and prunes lineitem before the
    single orders shuffle join; supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("__amt"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum(F.col("__amt"), "profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "x33_tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT partkey, value FROM val
    WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 0.001 FROM val)
    ORDER BY value DESC, partkey
    """,
)
def x33_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: shipped value per part from lineitem stands in
    for partsupp stock value): parts whose Asian-supplied value exceeds
    0.1% of the total. The global threshold is a one-row aggregate
    broadcast into the filter — no second scan of lineitem, no driver
    action; per-part and global sums both accumulate in exact decimal so
    the threshold comparison is bit-identical to the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(asia_supp), li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double").alias("value"))
    )
    thresh = val.agg(
        (F.sum(F.col("value").cast("decimal(38,6)")).cast("double") * 0.001).alias("__t")
    )
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("__t"))
        .select("partkey", "value")
        .orderBy(F.col("value").desc(), "partkey")
    )


@query(
    "x34_tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'ECONOMY%'
      AND p_size < 15
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def x34_tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per (brand, type, size),
    excluding flagged suppliers (negative balance stands in for the
    complaints LIKE). The NOT IN is a broadcast anti-join (s_suppkey is
    never NULL, so anti-join == NOT IN here); part filter broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("ECONOMY%"))
        & (F.col("p_size") < 15)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "x35_tpch_q20_part_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 450
      )
    ORDER BY s_name
    """,
)
def x35_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: shipped-quantity threshold stands in for the
    partsupp availqty comparison): American suppliers who moved > 450
    units of small parts in 1996. IN-with-aggregate becomes a semi-join
    against the HAVING aggregate; the part filter broadcasts into the
    lineitem scan, so the only shuffle is the per-supplier aggregate."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01")) & (F.col("l_shipdate") < _ntz("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    movers = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("__q"))
        .filter(F.col("__q") > 450)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(movers, "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "x36_tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def x36_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: ship > orderdate + 60 days stands in for the
    missing receipt/commit dates): suppliers who were the SOLE late
    supplier on a multi-supplier finalized order. The EXISTS / NOT EXISTS
    pair is rewritten as one per-order aggregation — per (order, supplier)
    late flags, then per-order supplier and late-supplier counts via a
    window over the same shuffle key — so lineitem shuffles once on
    l_orderkey instead of three correlated passes. The oracle keeps the
    textbook correlated form, making the check a genuine cross-derivation.
    numwait counts LATE LINES of qualifying suppliers (matching the
    oracle, which counts l1 rows)."""
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int").alias("__late"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__any_late"), F.sum("__late").alias("__late_lines")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.withColumn("__n_supp", F.count("*").over(w)).withColumn(
        "__n_late_supp", F.sum("__any_late").over(w)
    )
    sole_late = flagged.filter(
        (F.col("__any_late") == 1) & (F.col("__n_supp") > 1) & (F.col("__n_late_supp") == 1)
    )
    return (
        sole_late.join(F.broadcast(s), sole_late["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("__late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "x37_tpch_q22_sales_opportunity",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_acctbal, c_nationkey AS cntrycode
      FROM customer WHERE c_nationkey IN (3, 8, 13, 17, 20, 24)
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM pool
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        FROM pool WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def x37_tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: nation key stands in for the phone country
    code; "no orders at all" becomes "no orders since 1999" — the fixture
    has no orderless customers): wealthy-but-lapsed customers per country
    code. Scalar AVG broadcast into the filter, recent orders anti-joined;
    the avg divides an exact-decimal sum by the count so both engines
    compute the identical double."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pool = c.filter(F.col("c_nationkey").isin(3, 8, 13, 17, 20, 24)).select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").alias("cntrycode")
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double") / F.count("*"))
        .alias("__avg")
    )
    recent = o.filter(F.col("o_orderdate") >= _ntz("1999-01-01")).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
