"""Round-5 SQL-surface extensions: sequential funnel conversion, cohort
retention, and order/line-item reconciliation — the three report shapes
heaviest in real analyst folders that the registry didn't yet carry.

Same contract as every registry query (queries/__init__.py): exact
DECIMAL accumulation, engine-portable rounding, unique tie-breaks, and a
DuckDB oracle twin. The reference would ship these verbatim to MySQL
(/root/reference/src/loader.py:231).

Scale posture: each aggregates the events/fact stream on its natural key
(user/order) with map-side partials; the step joins are keyed by user id
(shuffle joins AQE can plan); final rollups run over per-user/per-order
aggregates, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query


@query(
    "x68_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
)
def x68_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (view -> click -> purchase IN ORDER): each step
    counts users whose earliest step-event is at or after their earliest
    completion of the previous step — the standard product-analytics
    funnel, not the orderless set-intersection shortcut. Three keyed
    min-aggregations + two user-keyed joins; timestamps compare exactly
    (micros both engines)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@query(
    "x69_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
             CAST(FLOOR(DATEDIFF('day', DATE '2024-01-01', f.d0) / 7.0) AS INT)
               AS cohort_week,
             CAST(FLOOR(DATEDIFF('day', f.d0, CAST(e.ts AS DATE)) / 7.0) AS INT)
               AS week_offset
      FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM act GROUP BY cohort_week, week_offset
    """,
)
def x69_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week, counted
    in each subsequent week they were active — the analyst retention
    triangle. One keyed min-agg for the cohort anchor, one user-keyed
    join back, distinct at the (user, cohort, offset) grain; the matrix
    is |cohorts| x |weeks| regardless of event volume. Integer week
    arithmetic is exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d0"))
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            F.floor(F.datediff("d0", F.lit("2024-01-01").cast("date")) / 7.0)
            .cast("int")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("ts").cast("date"), "d0") / 7.0)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )


@query(
    "x70_order_reconciliation",
    oracle="""
    WITH line_totals AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS line_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE line_total IS NULL) AS BIGINT)
             AS n_without_lines,
           CAST(COUNT(*) FILTER (WHERE line_total IS NOT NULL
                                   AND o_totalprice > line_total) AS BIGINT)
             AS n_price_above_lines
    FROM orders LEFT JOIN line_totals ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def x70_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/line-item reconciliation audit: per status, how many orders
    have no line items at all, and how many price above their summed
    lines — the cross-table integrity report a finance analyst runs
    before trusting either feed. Line totals reduce once on the order
    key (exact decimal) and left-join back; the comparison is
    decimal-exact so the counts are partitioning-proof."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("line_total")
    )
    joined = o.join(lt, o.o_orderkey == lt.l_orderkey, "left")
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("line_total").isNull()).alias("n_without_lines"),
        F.count_if(
            F.col("line_total").isNotNull()
            & (F.col("o_totalprice") > F.col("line_total"))
        ).alias("n_price_above_lines"),
    )


@query(
    "x71_brand_affinity",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem),
    brand_orders AS (SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
      FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                        AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_both,
           FLOOR((1.0 * n_ab * n) / (1.0 * ba.n_b * bb.n_b)
                 * 1000000.0 + 0.5) / 1000000.0 AS lift
    FROM pairs
    JOIN brand_orders ba ON pairs.brand_a = ba.p_brand
    JOIN brand_orders bb ON pairs.brand_b = bb.p_brand
    CROSS JOIN n_orders
    WHERE n_ab >= 5
    """,
)
def x71_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand affinity: for each brand pair co-occurring in
    >= 5 orders, the co-order count and lift
    (P(a,b) / (P(a)·P(b))) — the cross-sell report every retail analyst
    runs. The basket stream compresses to DISTINCT (order, brand) FIRST
    (10 brands -> <= 45 pairs per order regardless of line count), so
    the self-join is bounded by baskets x brands², never line items²;
    brand totals broadcast; lift is a ratio of exact counts through the
    portable round6_bin."""
    from sheetsetl_spark.operators.text import round6_bin

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = li.agg(F.countDistinct("l_orderkey").alias("n"))
    brand_orders = ob.groupBy("p_brand").agg(F.count("*").alias("n_b"))
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    ba = brand_orders.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na"))
    bb = brand_orders.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb"))
    lift = (F.lit(1.0) * F.col("n_ab") * F.col("n")) / (
        F.lit(1.0) * F.col("na") * F.col("nb")
    )
    return (
        pairs.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("n_both"),
            round6_bin(lift).alias("lift"),
        )
    )
