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


def test_zorder_value_interleaves_bits(spark):
    from sheetsetl_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(3, 5)], "a int, b int")
    # a=0b011 -> even positions 0,2 ; b=0b101 -> odd positions 1,5
    # z = 1<<0 + 1<<2 + 1<<1 + 1<<5 = 1+4+2+32 = 39
    assert df.select(zorder_value("a", "b").alias("z")).first()["z"] == 39


def test_zorder_layout_tightens_file_stats(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from sheetsetl_spark.operators.layout import zorder_by

    # 64x64 grid of (x, y) points, arriving in hash-shuffled order
    grid = spark.range(64 * 64).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y"
    ).repartition(8)

    def stat_width(path: str) -> tuple[int, int]:
        wx = wy = 0
        for f in glob.glob(path + "/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                row = meta.row_group(rg)
                cols = {row.column(i).path_in_schema: row.column(i) for i in range(row.num_columns)}
                wx += cols["x"].statistics.max - cols["x"].statistics.min
                wy += cols["y"].statistics.max - cols["y"].statistics.min
        return wx, wy

    grid.write.parquet(str(tmp_path / "shuffled"))
    zorder_by(grid, "x", "y", num_files=8, bits=6).write.parquet(str(tmp_path / "zordered"))

    sx, sy = stat_width(str(tmp_path / "shuffled"))
    zx, zy = stat_width(str(tmp_path / "zordered"))
    # shuffled files each span ~the full range on both axes; z-ordered
    # files cover compact rectangles -> strictly tighter on BOTH columns
    assert zx < sx * 0.7 and zy < sy * 0.7, (sx, sy, zx, zy)
    # lossless
    assert spark.read.parquet(str(tmp_path / "zordered")).count() == 64 * 64


def test_tpch_q5_broadcasts_all_dims_single_fact_shuffle(spark):
    """Q5's six-way join must broadcast every dimension: the only
    hash-partitioned exchanges allowed are the orders–lineitem join keys
    and the final n_name aggregation — no dimension may shuffle the fact."""
    from sheetsetl_spark.queries import QUERIES

    df = QUERIES["x16_tpch_q5_local_supplier_volume"](spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # at least the four true dimensions broadcast (AQE may upgrade the
    # filtered orders side too); lineitem itself must never shuffle into
    # a join — the only hash exchanges allowed are join-side inputs AQE
    # chose to keep plus the final n_name aggregation
    assert plan.count("BroadcastHashJoin") >= 4
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_tpch_q6_predicates_push_to_scan(spark):
    from sheetsetl_spark.queries import QUERIES

    df = QUERIES["x17_tpch_q6_forecast_revenue"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # every predicate column reaches the scan as a pushed filter
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    # projection pruned to exactly the needed columns
    rs = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_extendedprice" in rs and "l_orderkey" not in rs


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from sheetsetl_spark.sinks import OrcDirSink
    from sheetsetl_spark.sources.readers import read_orc

    o = load_table(spark, SF_SMALL, "orders")
    OrcDirSink(str(tmp_path)).write(o, "orders_orc")
    back = read_orc(spark, str(tmp_path / "orders_orc"))
    assert back.count() == o.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in o.schema.fields]
    plan = back.filter(F.col("o_orderkey") == 42)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]


def test_text_source_lines(spark, tmp_path):
    from sheetsetl_spark.sources.readers import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(p))
    assert sorted(r.value for r in lines.collect()) == ["line one", "line two", "solo"]
    whole = read_text(spark, str(p), whole_file=True)
    assert whole.count() == 2


def test_tpch_q21_single_lineitem_shuffle(spark):
    """Q21's EXISTS/NOT-EXISTS rewrite must touch lineitem through ONE
    orderkey-keyed aggregation chain — the textbook correlated form would
    scan and shuffle it three times. Allowed hash exchanges: the
    lineitem–orders join inputs and the per-order aggregate (all on
    l_orderkey), plus the final s_name aggregation."""
    from sheetsetl_spark.queries import QUERIES

    df = QUERIES["x36_tpch_q21_waiting_suppliers"](spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # one lineitem scan only — the whole point of the aggregation rewrite
    assert plan.count("FileScan parquet") <= 4  # lineitem, orders, supplier (+1 slack)
    scans = [seg.split("\n")[0] for seg in plan.split("FileScan parquet ")[1:]]
    li_scans = [s for s in scans if "l_orderkey" in s]
    assert len(li_scans) == 1, li_scans
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q2_window_reuses_aggregate_partitioning(spark):
    """Q2's correlated-MIN-as-window must not add an exchange beyond the
    cost aggregate's own l_partkey partitioning: the window's
    partitionBy matches the groupBy key, so Catalyst plans window-over-
    aggregate with no intervening shuffle of the cost table."""
    from sheetsetl_spark.queries import QUERIES

    df = QUERIES["x31_tpch_q2_min_cost_supplier"](spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    # exchanges: cost groupBy on (l_partkey, l_suppkey)... the window
    # needs l_partkey-only partitioning -> at most 2 hash exchanges for
    # the chain, plus the final orderBy's range exchange
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
