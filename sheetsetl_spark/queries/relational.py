"""B-series tier 1-3: scans, projection/filter, joins, aggregation.

These re-express, Spark-first, the MySQL SELECT surface the reference
delegates wholesale at /root/reference/src/loader.py:231 (SURVEY.md §2-B
rows B1-B29). Everything below is pure DataFrame API — Catalyst plans the
physical strategy (broadcast-hash for dimension joins, partial+final hash
aggregation, AQE re-planning), which is exactly what we want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table, register_views
from sheetsetl_spark.queries import davg, dsum, query


def _dsum(col: Column, alias: str) -> Column:
    """Order-independent double sum: exact DECIMAL(18,6) accumulation."""
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def _davg(col: Column, alias: str) -> Column:
    """Deterministic avg: exact decimal sum / count, rounded to 6."""
    return F.round(
        F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(col), 6
    ).alias(alias)


def _ntz(s: str) -> Column:
    return F.lit(s).cast("timestamp_ntz")


# --------------------------------------------------------------------------
# B1/B6: scan -> filter -> project (pushdown + pruning reach the parquet scan)
# --------------------------------------------------------------------------
@query(
    "b01_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def b01_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/B8: base-table scan with pushed filter and pruned columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= _ntz("1998-01-01")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "b06_computed_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 6) AS revenue,
           l_returnflag || '/' || l_linestatus AS flag
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-07-01 00:00:00'
    """,
)
def b06_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: SELECT expr AS alias — computed columns (loader.py:235 names)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < _ntz("1995-07-01")).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag"),
    )


@query(
    "b07_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def b07_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: SELECT DISTINCT (hash-agg dedup, map-side partials)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "b08_filter_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      AND c_acctbal BETWEEN 0 AND 5000
      AND c_name LIKE '%5%'
      AND c_nationkey IS NOT NULL
    """,
)
def b08_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: AND/IN/BETWEEN/LIKE/IS NOT NULL predicate stack."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
        & F.col("c_acctbal").between(0, 5000)
        & F.col("c_name").like("%5%")
        & F.col("c_nationkey").isNotNull()
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "b09_nullsafe_eq",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    WHERE NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b09_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9/B10: three-valued NULL logic + MySQL <=> (eqNullSafe)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.nullif(F.col("l_returnflag"), F.lit("N")).eqNullSafe(
                F.nullif(F.col("l_linestatus"), F.lit("O"))
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "b10_case_conditionals",
    oracle="""
    SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS status,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'default') AS prio,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def b10_case_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: CASE WHEN / IF() / IFNULL / NULLIF / COALESCE."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.when(F.col("o_totalprice") > 300000, "big")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("small")
            .alias("bucket"),
            F.when(F.col("o_orderstatus") == "O", "open").otherwise("closed").alias("status"),
            F.coalesce(F.nullif("o_orderpriority", F.lit("3-MEDIUM")), F.lit("default")).alias(
                "prio"
            ),
        )
        .groupBy("bucket", "status", "prio")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "b11_casts",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST('123' AS INTEGER) + l_linenumber AS plus123
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def b11_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: CAST/CONVERT across string/int/date (MySQL-leniency notes in
    session.py; FLOOR before int-cast because double->int rounding differs
    across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        (F.lit("123").cast("int") + F.col("l_linenumber")).alias("plus123"),
    )


# --------------------------------------------------------------------------
# B12-B20: joins. Dimension sides are explicitly broadcast — at 100 TB the
# fact side never shuffles for these star joins.
# --------------------------------------------------------------------------
@query(
    "b12_inner_join",
    oracle="""
    SELECT r.r_name, COUNT(*) AS num_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def b12_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: equi inner join chain; nation/region broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("num_customers"), _dsum(F.col("c_acctbal"), "total_acctbal"))
    )


@query(
    "b13_left_join",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def b13_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: LEFT OUTER JOIN preserving order-less customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), F.lit(0))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "b14_cross_join",
    oracle="SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
)
def b14_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: Cartesian product (bounded to dimension tables)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "b15_theta_join",
    oracle="""
    SELECT s1.s_nationkey AS nationkey, COUNT(*) AS pair_cnt
    FROM supplier s1
    JOIN supplier s2
      ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
    GROUP BY s1.s_nationkey
    """,
)
def b15_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: non-equi (theta) join — equi key keeps it a hash join with a
    post-filter rather than a pure nested loop (the 100 TB-safe shape)."""
    s1 = load_table(spark, sf_dir, "supplier").alias("s1")
    s2 = load_table(spark, sf_dir, "supplier").alias("s2")
    return (
        s1.join(
            s2,
            (F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
            & (F.col("s1.s_acctbal") < F.col("s2.s_acctbal")),
        )
        .groupBy(F.col("s1.s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("pair_cnt"))
    )


@query(
    "b16_self_join",
    oracle="""
    SELECT o1.o_custkey AS custkey, COUNT(*) AS pair_cnt
    FROM orders o1
    JOIN orders o2
      ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
    GROUP BY o1.o_custkey
    """,
)
def b16_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: self-join via aliases (order pairs per customer)."""
    o1 = load_table(spark, sf_dir, "orders").alias("o1")
    o2 = load_table(spark, sf_dir, "orders").alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o1.o_orderkey") < F.col("o2.o_orderkey")),
        )
        .groupBy(F.col("o1.o_custkey").alias("custkey"))
        .agg(F.count("*").alias("pair_cnt"))
    )


@query(
    "b17_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def b17_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: existential semi-join (WHERE EXISTS / IN-subquery)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "b18_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def b18_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: anti-join (NOT EXISTS / NOT IN / left-join-IS-NULL idiom).

    Customers with no FINISHED order: the synthetic orders table covers
    every custkey, so the unfiltered "no orders at all" form returned 0
    rows at every SF and the driver's r1/r5 green stamps hash-matched
    two empty frames (vacuous). The status filter keeps the operator
    shape identical (filter pushed below the anti-join build side) while
    making the correctness stamp compare real rows at each SF."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "b19_full_outer_join",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt
                FROM customer WHERE c_nationkey < 15 GROUP BY c_nationkey),
         sc AS (SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt
                FROM supplier WHERE s_nationkey > 10 GROUP BY s_nationkey)
    SELECT COALESCE(cc.nk, sc.nk) AS nationkey, cc.cust_cnt, sc.supp_cnt
    FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk
    """,
)
def b19_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: FULL OUTER JOIN — native in Spark (MySQL must emulate via
    UNION of left+right; we support the native form)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cc = (
        c.filter(F.col("c_nationkey") < 15)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    sc = (
        s.filter(F.col("s_nationkey") > 10)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("supp_cnt"))
    )
    return cc.join(sc, cc.nk == sc.nk, "full").select(
        F.coalesce(cc.nk, sc.nk).alias("nationkey"), "cust_cnt", "supp_cnt"
    )


@query(
    "b20_star_join",
    oracle="""
    SELECT r.r_name, YEAR(o.o_orderdate) AS order_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS num_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, YEAR(o.o_orderdate)
    """,
)
def b20_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: multi-way star join (TPC-H Q5 shape). Facts join facts on the
    shuffle; every dimension is broadcast so the big side shuffles once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").alias("order_year"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("num_items"),
        )
    )


# --------------------------------------------------------------------------
# B21-B28: aggregation
# --------------------------------------------------------------------------
@query(
    "b21_groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity', 'sum_qty')},
           {dsum('l_extendedprice', 'sum_base_price')},
           {dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {davg('l_quantity', 'avg_qty')},
           {davg('l_extendedprice', 'avg_price')},
           {davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b21_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 flagship (TPC-H Q1 shape): scan -> filter -> partial+final hash
    agg. The per-round bench headline query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= _ntz("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            _davg(F.col("l_quantity"), "avg_qty"),
            _davg(F.col("l_extendedprice"), "avg_price"),
            _davg(F.col("l_discount"), "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "b22_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           CAST(SUM(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_linenum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b22_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: COUNT(DISTINCT) / SUM(DISTINCT) (expand + two-phase agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.sum_distinct(F.col("l_linenumber")).cast("bigint").alias("sum_distinct_linenum"),
    )


@query(
    "b23_group_concat",
    oracle="""
    SELECT c_nationkey, STRING_AGG(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def b23_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: MySQL GROUP_CONCAT(x ORDER BY x SEPARATOR ',') — determinized
    as concat_ws over a sorted collect_list."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("c_mktsegment"))).alias("segments")
    )


@query(
    "b24_stats_agg",
    oracle="""
    WITH mom AS (
      SELECT c_mktsegment,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))
                      * CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sxx
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n,
           CASE WHEN n > 1 THEN
             CASE WHEN (sxx - sx * sx / n) / (n - 1)
                       <= ((sx / n) * (sx / n) + 1) * 1e-9 THEN 0.0
                  ELSE FLOOR((sxx - sx * sx / n) / (n - 1) * 10000.0 + 0.5)
                       / 10000.0 END
           END AS var_samp_acctbal,
           CASE WHEN n > 1 THEN
             CASE WHEN (sxx - sx * sx / n) / (n - 1)
                       <= ((sx / n) * (sx / n) + 1) * 1e-9 THEN 0.0
                  ELSE FLOOR(SQRT((sxx - sx * sx / n) / (n - 1)) * 10000.0 + 0.5)
                       / 10000.0 END
           END AS stddev_samp_acctbal
    FROM mom
    """,
)
def b24_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: STDDEV_SAMP/VAR_SAMP — computed from exact decimal moments so
    the result is independent of partition/accumulation order (native
    float stddev is order-sensitive in the last ulp).

    Degenerate-group hygiene (the x60/x61 fuzz lessons): a singleton
    group emits NULL (var_samp is undefined, matching standard SQL); a
    constant group's `sxx - sx^2/n` is pure cancellation noise, so
    anything under the relative floor collapses to exactly 0.0; rounding
    is the binary FLOOR form both engines evaluate identically."""
    c = load_table(spark, sf_dir, "customer")
    # sxx multiplies DECIMAL-cast factors (exact decimal product), never
    # casts the double product: rounding a double product at a grain
    # comparable to its ulp (c_acctbal^2 ~ 5e7 has ulp 7e-9 vs a 5e-9
    # half-grain at scale 8) splits between Spark's shortest-repr
    # half-up cast and DuckDB's binary rounding — fuzz-caught r5.
    # (12,4) factors: exact for 2-dp money, and the factor multiply fits
    # DuckDB's int64 operand path ((18,6) factors overflow there)
    bal4 = F.col("c_acctbal").cast("decimal(12,4)")
    mom = c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(bal4 * bal4).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    mean = sx / n
    floor_ = (mean * mean + 1) * 1e-9

    def guarded(expr):
        return F.when(
            n > 1,
            F.when(var <= floor_, F.lit(0.0)).otherwise(
                F.floor(expr * 10000.0 + 0.5) / 10000.0
            ),
        )

    return mom.select(
        "c_mktsegment",
        "n",
        guarded(var).alias("var_samp_acctbal"),
        guarded(F.sqrt(var)).alias("stddev_samp_acctbal"),
    )


@query(
    "b25_having",
    oracle="""
    SELECT p_brand, COUNT(*) AS part_cnt,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM part
    GROUP BY p_brand
    HAVING COUNT(*) > 50 AND SUM(p_size) > 100
    """,
)
def b25_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: HAVING — post-aggregation filter."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count("*").alias("part_cnt"),
            _dsum(F.col("p_retailprice"), "total_price"),
            F.sum("p_size").alias("_size_sum"),
        )
        .filter((F.col("part_cnt") > 50) & (F.col("_size_sum") > 100))
        .drop("_size_sum")
    )


@query(
    "b26_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS cust_cnt,
           CAST(GROUPING(r.r_name) AS INTEGER) AS g_region,
           CAST(GROUPING(n.n_name) AS INTEGER) AS g_nation
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def b26_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: GROUP BY ... WITH ROLLUP + GROUPING() flags."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("cust_cnt"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


@query(
    "b27_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           {dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def b27_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: CUBE / GROUPING SETS multi-grouping."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), _dsum(F.col("l_quantity"), "sum_qty")
    )


@query(
    "b28_global_agg",
    oracle="""
    SELECT COUNT(*) AS num_orders,
           COUNT(DISTINCT o_custkey) AS num_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders
    """,
)
def b28_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: ungrouped (global) aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("num_orders"),
        F.countDistinct("o_custkey").alias("num_customers"),
        _dsum(F.col("o_totalprice"), "total_revenue"),
        F.min("o_orderdate").cast("date").alias("first_order"),
        F.max("o_orderdate").cast("date").alias("last_order"),
    )


@query(
    "b59_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def b59_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B59: PIVOT — event counts spread into per-type columns (the
    conditional-aggregation idiom MySQL analysts write by hand; Spark
    plans it as one hash aggregate either way)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view", "error"])
        .count()
    )
    # pivot leaves null for absent combos; the oracle's COUNT gives 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("click", "purchase", "view", "error")],
    )


@query(
    "b60_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
    FROM orders WHERE o_orderkey < 100
    UNION ALL
    SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
    FROM orders WHERE o_orderkey < 100
    """,
)
def b60_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B60: UNPIVOT/stack — wide columns to (metric, value) rows, the
    long-format reshape feeding charting/ML tooling."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.selectExpr(
        "o_orderkey",
        "stack(2, 'totalprice', o_totalprice, 'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, value)",
    )


@query(
    "b61_lateral_join",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 6) AS top_price
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
    WHERE c.c_custkey < 50
    """,
)
def b61_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B61: LATERAL correlated subquery — each customer's single priciest
    order (Spark 3.4+ supports LATERAL natively; Catalyst decorrelates it
    into a window/aggregate join rather than a per-row loop)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 6) AS top_price
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
        WHERE c.c_custkey < 50
        """
    )


@query(
    "b62_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(FLOOR(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_lo,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1, 2
    """,
)
def b62_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B62: equi-width histogram — the profiling/charting staple, one
    hash aggregate over computed buckets."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(
        bucket.cast("bigint").alias("bucket"),
        (bucket * 50000).cast("bigint").alias("bucket_lo"),
    ).agg(F.count("*").alias("cnt"))
