"""Scale-layout features: partitioned output (partition pruning) and
bucketed tables (shuffle-free co-located joins)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.sinks import BucketedTableSink, ParquetDirSink
from tests.conftest import SF_SMALL


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    o = load_table(spark, SF_SMALL, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    ParquetDirSink(str(tmp_path), partition_by=["order_year"]).write(o, "orders_part")
    root = tmp_path / "orders_part"
    years = sorted(d for d in os.listdir(root) if d.startswith("order_year="))
    assert len(years) >= 3  # hive-style layout materialized

    back = spark.read.parquet(str(root)).filter(F.col("order_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: only the matching partition directory is scanned
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == o.filter(F.year("o_orderdate") == 1996).count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    BucketedTableSink(4, ["l_orderkey"]).write(li, "li_bucketed")
    BucketedTableSink(4, ["o_orderkey"]).write(o, "o_bucketed")

    joined = spark.table("li_bucketed").join(
        spark.table("o_bucketed"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # Bucketed-bucketed equi-join: no Exchange on either side.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_scan_pushdown_and_pruning(spark):
    from sheetsetl_spark.queries import QUERIES

    df = QUERIES["b21_groupby_agg"](spark, SF_SMALL)
    df.collect()  # materialize so AQE finalizes the plan (codegen visible)
    plan = _executed_plan(df)
    # filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed lineitem columns are read
    scan_line = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "l_quantity" in scan_line and "l_partkey" not in scan_line
    # the agg pipeline runs inside whole-stage codegen ("*(n)" stage marks)
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_star_join_broadcasts_every_dimension(spark):
    from sheetsetl_spark.queries import QUERIES

    plan = _executed_plan(QUERIES["b20_star_join"](spark, SF_SMALL))
    # all dimension joins are broadcast-hash; the only Exchange is the
    # final aggregation's (plus AQE coalescing wrappers)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered(spark):
    from sheetsetl_spark.queries import QUERIES

    plan = _executed_plan(QUERIES["b36_topk"](spark, SF_SMALL))
    # ORDER BY .. LIMIT k must plan as TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in plan
