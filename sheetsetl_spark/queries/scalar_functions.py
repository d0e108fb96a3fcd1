"""B-series tier 4c: scalar function families (SURVEY §2-B B43-B48).

Each query exercises one MySQL built-in family the reference's analysts
use through the delegation at /root/reference/src/loader.py:231, mapped to
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen friendly — never
Python UDFs). Oracle SQL is written in DuckDB's dialect where names differ
(e.g. strftime vs date_format, 'g' flag on regexp_replace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query


@query(
    "b43_string_functions",
    oracle="""
    SELECT c_custkey,
           c_name || '#' || c_mktsegment AS tagged,
           SUBSTRING(c_name, 10, 5) AS sub5,
           UPPER(c_mktsegment) AS seg_up,
           LOWER(c_name) AS name_lo,
           TRIM('  ' || c_name || ' ') AS trimmed,
           REPLACE(c_name, 'Customer', 'Cust') AS replaced,
           LPAD(CAST(c_custkey AS VARCHAR), 12, '0') AS lpadded,
           RPAD(c_mktsegment, 12, '.') AS rpadded,
           CAST(INSTR(c_name, '5') AS INTEGER) AS pos5,
           REVERSE(c_mktsegment) AS seg_rev,
           REPEAT(c_mktsegment, 2) AS seg2,
           ARRAY_TO_STRING(STRING_SPLIT(c_name, '0')[1:2], '0') AS si2,
           LEFT(c_name, 4) AS l4,
           RIGHT(c_name, 3) AS r3,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
)
def b43_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43: CONCAT/SUBSTRING/UPPER/LOWER/TRIM/REPLACE/LPAD/RPAD/INSTR/
    REVERSE/REPEAT/SUBSTRING_INDEX/LEFT/RIGHT/LENGTH."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
        F.substring("c_name", 10, 5).alias("sub5"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("lpadded"),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("rpadded"),
        F.instr(F.col("c_name"), "5").cast("int").alias("pos5"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg2"),
        F.substring_index(F.col("c_name"), "0", 2).alias("si2"),
        F.expr("left(c_name, 4)").alias("l4"),
        F.expr("right(c_name, 3)").alias("r3"),
        F.length("c_name").cast("int").alias("name_len"),
    )


@query(
    "b44_regex_functions",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[aeiou]')) AS INTEGER) AS vowel_cnt
    FROM part
    WHERE REGEXP_MATCHES(p_name, '^(red|blue)')
    """,
)
def b44_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44: RLIKE filter, REGEXP_EXTRACT, REGEXP_REPLACE, REGEXP_COUNT
    (MySQL REGEXP / 8.0 REGEXP_* family)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("^(red|blue)")).select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).cast("int").alias("vowel_cnt"),
    )


@query(
    "b45_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
           CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
           CAST(DAY(o_orderdate) AS INTEGER) AS dom,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
             AS days_since_95,
           STRFTIME(o_orderdate, '%Y-%m') AS ym,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS ext_year
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def b45_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45: YEAR/MONTH/DAY/QUARTER/DAYOFWEEK/DATE_ADD/DATEDIFF/DATE_FORMAT/
    LAST_DAY/DATE_TRUNC/EXTRACT. MySQL DAYOFWEEK is 1=Sunday — Spark's
    dayofweek matches; DuckDB's is 0=Sunday, shimmed with +1 in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.expr("EXTRACT(YEAR FROM o_orderdate)").cast("int").alias("ext_year"),
    )


@query(
    "b46_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_quantity - 25), 6) AS absval,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ceilv,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floorv,
           ROUND(l_discount, 2) AS roundv,
           l_orderkey % 7 AS modv,
           ROUND(POWER(l_quantity, 2), 6) AS powv,
           ROUND(SQRT(l_extendedprice), 6) AS sqrtv,
           ROUND(EXP(l_discount), 6) AS expv,
           ROUND(LN(l_extendedprice), 6) AS lnv,
           ROUND(LOG10(l_extendedprice), 6) AS log10v,
           CAST(SIGN(l_quantity - 25) AS INTEGER) AS signv,
           ROUND(GREATEST(l_quantity, l_discount * 100), 6) AS big,
           ROUND(LEAST(l_quantity, l_discount * 100), 6) AS small,
           l_orderkey // 100 AS idiv
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def b46_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: ABS/CEIL/FLOOR/ROUND/MOD/POW/SQRT/EXP/LN/LOG10/SIGN/GREATEST/
    LEAST/DIV (MySQL integer division)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_quantity") - 25), 6).alias("absval"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceilv"),
        F.floor("l_extendedprice").cast("bigint").alias("floorv"),
        F.round("l_discount", 2).alias("roundv"),
        (F.col("l_orderkey") % 7).alias("modv"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("powv"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrtv"),
        F.round(F.exp("l_discount"), 6).alias("expv"),
        F.round(F.log("l_extendedprice"), 6).alias("lnv"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10v"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("signv"),
        F.round(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100), 6).alias("big"),
        F.round(F.least(F.col("l_quantity"), F.col("l_discount") * 100), 6).alias("small"),
        F.expr("l_orderkey DIV 100").alias("idiv"),
    )


@query(
    "b47_json_functions",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS cnt,
           MIN(ARRAY_TO_STRING(JSON_KEYS(props::JSON), ',')) AS keys_csv
    FROM events
    GROUP BY event_type
    """,
)
def b47_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: MySQL 5.7 JSON family — JSON_EXTRACT/->>/JSON_KEYS via
    get_json_object / json_object_keys (C6 twin lives in extensions)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).cast("bigint").alias("sum_k"),
        F.count("*").alias("cnt"),
        F.min(F.concat_ws(",", F.json_object_keys("props"))).alias("keys_csv"),
    )


@query(
    "b48_hash_functions",
    oracle="""
    SELECT n_nationkey,
           MD5(n_name) AS name_md5,
           SHA256(n_name) AS name_sha256,
           UPPER(HEX(n_nationkey)) AS key_hex,
           TO_BASE64(ENCODE(n_name)) AS name_b64
    FROM nation
    """,
)
def b48_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48: MD5/SHA2/HEX/TO_BASE64 crypto+encoding family."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2(F.col("n_name"), 256).alias("name_sha256"),
        F.upper(F.hex(F.col("n_nationkey"))).alias("key_hex"),
        F.base64(F.col("n_name").cast("binary")).alias("name_b64"),
    )
