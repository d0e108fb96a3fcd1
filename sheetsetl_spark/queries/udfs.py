"""B-series tier 5: derived tables/views (B2/B3) and the UDF surface
(B56-B58) — plus the approximate-aggregate extension.

UDF doctrine at 100 TB (SURVEY §2 B56): built-ins first; when Python is
unavoidable, Arrow-batched pandas_udf / applyInPandas, never row-at-a-time
F.udf. The UDF queries here intentionally compute SQL-expressible results
so the DuckDB oracle can verify the UDF machinery end-to-end.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sheetsetl_spark.catalog import load_table, register_views
from sheetsetl_spark.queries import query

_SIX = Decimal("0.000001")


@query(
    "b02_derived_table",
    oracle="""
    SELECT x.bucket, COUNT(*) AS cnt,
           CAST(SUM(CAST(x.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM (SELECT o_totalprice,
                 CASE WHEN o_totalprice > 200000 THEN 'hi' ELSE 'lo' END AS bucket
          FROM orders WHERE o_orderstatus <> 'P') x
    GROUP BY x.bucket
    """,
)
def b02_derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: inline view / derived table in FROM."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT x.bucket, COUNT(*) AS cnt,
               CAST(SUM(CAST(x.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM (SELECT o_totalprice,
                     CASE WHEN o_totalprice > 200000 THEN 'hi' ELSE 'lo' END AS bucket
              FROM orders WHERE o_orderstatus <> 'P') x
        GROUP BY x.bucket
        """
    )


@query(
    "b03_view",
    oracle="""
    WITH cust_orders AS (
      SELECT c.c_nationkey, o.o_totalprice
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    )
    SELECT c_nationkey, COUNT(*) AS cnt
    FROM cust_orders WHERE o_totalprice > 100000
    GROUP BY c_nationkey
    """,
)
def b03_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: named view over a query (CREATE TEMP VIEW -> queried like a
    table; the replica-VIEW analog the reference's analysts rely on)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW cust_orders AS
        SELECT c.c_nationkey, o.o_totalprice
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        """
    )
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS cnt
        FROM cust_orders WHERE o_totalprice > 100000
        GROUP BY c_nationkey
        """
    )


@query(
    "b56_pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    WHERE l_orderkey % 40 = 0
    """,
)
def b56_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56: vectorized scalar pandas_udf (Arrow batches, columnar math in
    numpy — the sanctioned Python escape hatch)."""

    @F.pandas_udf(T.DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 - disc) * (1 + tax)).round(6)

    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 40 == 0).select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@query(
    "b57_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty_total,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b57_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B57: custom grouped aggregation via applyInPandas. The UDAF mirrors
    the engine's exact-decimal accumulation so its result is
    order-independent and oracle-checkable."""

    def agg_group(pdf: pd.DataFrame) -> pd.DataFrame:
        total = sum(
            Decimal(str(v)).quantize(_SIX, rounding=ROUND_HALF_UP)
            for v in pdf["l_quantity"]
        )
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "qty_total": [float(total)],
                "cnt": [len(pdf)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return li.groupBy("l_returnflag").applyInPandas(
        agg_group, schema="l_returnflag string, qty_total double, cnt bigint"
    )


@query(
    "b58_explode_lateral",
    oracle="""
    SELECT t.term, COUNT(*) AS occurrences
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents WHERE lang = 'en') t
    GROUP BY t.term
    HAVING COUNT(*) > 100
    """,
)
def b58_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B58: table-generating function (explode / LATERAL VIEW)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("occurrences"))
        .filter(F.col("occurrences") > 100)
    )


@query(
    "x1_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           CAST(ABS(APPROX_COUNT_DISTINCT(l_partkey) - COUNT(DISTINCT l_partkey))
                <= 0.05 * COUNT(DISTINCT l_partkey) AS INT) AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def x1_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension: HyperLogLog approximate distinct — the 100 TB answer to
    B22 when exactness isn't required (one pass, fixed memory, no expand).

    The raw HLL estimate is engine-specific, so the hash-checkable
    contract is (exact value, estimate-within-5%-of-exact flag): each
    engine runs its OWN sketch (Spark HLL++ rsd=0.02, DuckDB HLL) and
    both must land inside the tolerance — the oracle checks the
    guarantee, not the estimator's internals."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_partkey")
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (F.abs(approx - exact) <= 0.05 * exact).cast("int").alias("approx_within_tol"),
    )


@query(
    "b47b_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY event_type
    """,
)
def b47b_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47 (Spark 4 form): semi-structured props via the VARIANT type —
    parse once with ``parse_json``, extract typed fields with
    ``variant_get``. VARIANT keeps a binary-encoded tree, so repeated
    extractions skip re-tokenizing the JSON text (the Spark-4-native
    upgrade over per-path ``get_json_object``; at 100 TB the parse
    happens once per row instead of once per path). The oracle extracts
    the same path from the raw JSON text."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("__k"))
        .filter(F.col("__k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("__k").alias("sum_k"),
            F.max("__k").alias("max_k"),
        )
    )


@query(
    "b58b_python_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id, CAST(s AS INTEGER) AS pos, w[s] AS token
    FROM t, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEAST(LEN(w), 5))) AS s) u
    """,
)
def b58b_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B58 (Spark 3.5+ API form): a genuine Python UDTF in a LATERAL
    join — one input row expands to k output rows inside the plan.

    This exists to cover the table-function API surface; it is the slow
    path by design (row-at-a-time Python). Anything expressible with
    explode/posexplode/inline (see b58_explode_lateral) should use those:
    they stay in whole-stage codegen. The input here is pre-filtered to
    1/50th of the corpus, the pattern for bounding Python-side cost."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class FirstTokens:
        def eval(self, text: str, k: int):
            for i, tok in enumerate(text.split(" ")[:k], start=1):
                yield i, tok

    spark.udtf.register("first_tokens", FirstTokens)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, pos, token FROM __udtf_docs, LATERAL first_tokens(text, 5)"
    )


@query(
    "b57b_grouped_map_zscore",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))
                      * CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sxx,
             COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           ROUND((c.c_acctbal - m.sx / m.n)
                 / SQRT((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)), 6) AS acctbal_z
    FROM customer c JOIN m USING (c_mktsegment)
    """,
)
def b57b_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B57 grouped-MAP tier: per-group normalization via applyInPandas —
    one output row per input row (the transform shape, complementing
    b57's one-row-per-group aggregate shape). Group moments are
    accumulated in exact decimal (the b24 recipe) so the per-row z-score
    is order-independent and hash-checkable; the whole group fits one
    Arrow batch by construction (segments are low-cardinality; for
    high-cardinality keys this op shards naturally by group)."""

    def zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {
                    "c_custkey": pd.Series([], dtype="int64"),
                    "c_mktsegment": pd.Series([], dtype="object"),
                    "acctbal_z": pd.Series([], dtype="float64"),
                }
            )
        sx = float(
            sum(Decimal(str(v)).quantize(_SIX, rounding=ROUND_HALF_UP) for v in pdf["c_acctbal"])
        )
        sxx = float(
            sum(
                # exact-decimal square of the 6dp-quantized factor — the
                # oracle multiplies DECIMAL-cast factors the same way.
                # (Casting the double PRODUCT to a fixed scale instead
                # splits between repr-based and binary rounding when the
                # grain ~ ulp — the b24 fuzz catch, r5.)
                Decimal(str(v)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
                ** 2
                for v in pdf["c_acctbal"]
            )
        )
        mean = sx / n
        # Degenerate groups (singleton: n-1 == 0; constant: variance 0)
        # get NULL z-scores — SQL's x/0.0 and SQRT of a 0/0 both yield
        # NULL-ish non-answers, and NULL is the hash-stable rendering.
        var = (sxx - sx * sx / n) / (n - 1) if n > 1 else 0.0
        std = math.sqrt(var) if var > 0.0 else 0.0
        if std > 0.0 and math.isfinite(std):
            z = ((pdf["c_acctbal"] - mean) / std).round(6)
        else:
            z = pd.Series([None] * n, dtype="object")
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "acctbal_z": z,
            }
        )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore_group, schema="c_custkey bigint, c_mktsegment string, acctbal_z double"
    )
