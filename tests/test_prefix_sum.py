"""prefix_sum: the range-partitioned running total must reproduce the
naive global ordered window EXACTLY, while keeping every data-sized plan
stage parallel."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from sheetsetl_spark.operators.prefix import prefix_sum
from sheetsetl_spark.queries import QUERIES
from tests.conftest import SF_SMALL


def _naive(df, order_by, value_col, out_col):
    w = Window.orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def _rows(df, key):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: t[: len(key)] if key else t
    )


def test_matches_naive_window_asc(spark):
    df = spark.range(0, 257).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 101).alias("v")
    )
    got = prefix_sum(df, [F.asc("k")], F.col("v"), "cum")
    want = _naive(df, [F.asc("k")], F.col("v"), "cum")
    assert _rows(got.select("k", "v", "cum"), ["k"]) == _rows(
        want.select("k", "v", "cum"), ["k"]
    )


def test_matches_naive_window_desc_with_tiebreak(spark):
    # duplicate values, unique (v desc, k) order — the x66/x67 shape
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 13).alias("v")
    )
    order = [F.desc("v"), F.asc("k")]
    got = prefix_sum(df, order, F.col("v"), "cum", num_partitions=7)
    want = _naive(df, order, F.col("v"), "cum")
    assert _rows(got, ["k"]) == _rows(want, ["k"])


def test_decimal_exact(spark):
    df = spark.range(0, 128).select(
        F.col("id").alias("k"),
        ((F.col("id") % 9) / 3.0).cast("decimal(38,6)").alias("v"),
    )
    got = prefix_sum(df, [F.asc("k")], F.col("v"), "cum", num_partitions=5)
    want = _naive(df, [F.asc("k")], F.col("v"), "cum")
    assert _rows(got, ["k"]) == _rows(want, ["k"])
    assert dict(got.dtypes)["cum"].startswith("decimal")


def test_repartition_invariance(spark):
    base = spark.range(0, 200).select(
        F.col("id").alias("k"), ((F.col("id") * 11) % 17).alias("v")
    )
    a = _rows(prefix_sum(base.repartition(13), [F.asc("k")], F.col("v"), "c"), ["k"])
    b = _rows(prefix_sum(base.coalesce(1), [F.asc("k")], F.col("v"), "c"), ["k"])
    assert a == b


def test_single_row_and_empty(spark):
    one = spark.createDataFrame([(1, 5)], "k int, v int")
    assert prefix_sum(one, [F.asc("k")], F.col("v"), "c").collect()[0]["c"] == 5
    empty = one.filter("k < 0")
    assert prefix_sum(empty, [F.asc("k")], F.col("v"), "c").count() == 0


def test_requires_order(spark):
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    try:
        prefix_sum(df, [], F.col("v"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_x67_plan_no_single_partition_data_window(spark):
    """The only single-partition window may run over the bounded
    bucket-totals aggregate — the base per-part rows must flow through
    the deterministic-bucket hash exchange (r11 prefix.py bucket path:
    no sampled range exchange, no localCheckpoint pin), never an
    Exchange SinglePartition ahead of a data window."""
    df = QUERIES["x67_running_total"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucket path: the data window clusters on the deterministic bucket
    # id — visible as a hash exchange on the bucket column, with no
    # checkpoint RDD scan and no sampled range exchange in the plan
    assert "__ps_pid" in plan, plan
    assert "ExistingRDD" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            # upstream (printed below) must contain the totals
            # HashAggregate — i.e. the single partition holds bucket
            # totals, not data rows
            assert any("HashAggregate" in x for x in lines[i:]), plan


@pytest.mark.slow  # randomized/corpus sweep - full-suite re-verification
def test_property_matches_naive_on_random_inputs(spark):
    """Hypothesis sweep: random values, duplicates, negatives, and random
    partition counts — the decomposition must equal the naive window on
    every draw (unique (v, k) order)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
        nparts=st.integers(1, 9),
    )
    def check(vals, nparts):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k int, v long"
        )
        order = [F.desc("v"), F.asc("k")]
        got = prefix_sum(df, order, F.col("v"), "cum", num_partitions=nparts)
        want = _naive(df, order, F.col("v"), "cum")
        assert _rows(got, ["k"]) == _rows(want, ["k"])

    check()


@pytest.mark.slow  # randomized/corpus sweep - full-suite re-verification
def test_property_bucketed_matches_naive_on_random_inputs(spark):
    """Hypothesis sweep for the r11 deterministic-bucket path: random
    values (duplicates, negatives, all-equal draws that collapse the
    min/max width to zero), desc order via a negated bucket_expr, and
    random bucket scaling — must equal the naive window on every draw."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
        nparts=st.integers(1, 9),
        desc=st.booleans(),
    )
    def check(vals, nparts, desc):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k int, v long"
        )
        if desc:
            order = [F.desc("v"), F.asc("k")]
            bexpr = -F.col("v")
        else:
            order = [F.asc("v"), F.asc("k")]
            bexpr = F.col("v")
        got = prefix_sum(
            df, order, F.col("v"), "cum",
            num_partitions=nparts, bucket_expr=bexpr,
        )
        want = _naive(df, order, F.col("v"), "cum")
        assert _rows(got, ["k"]) == _rows(want, ["k"])

    check()


def test_bucketed_hostile_skew_is_clamped(spark):
    """Hostile value skew (r12, guide §2.5): a multiplicatively spread
    key — the revenue/price shape every bucket_expr caller passes —
    must NOT concentrate the stream into one window partition. Uniform
    buckets on the raw value put >90% of these rows in bucket 0 (the
    whole tail shares the low value range); the log-space buckets
    spread them near-uniformly. Asserts BOTH the equality property
    (the decomposition is exact regardless of where boundaries fall)
    and a bounded max share of the window-side partitioning, measured
    on the operator's actual output partitions."""
    import math

    n = 360
    rows = [(i, float(math.exp(i / 12.0))) for i in range(n)]  # 1 .. ~1e13
    df = spark.createDataFrame(rows, "k int, v double")
    order = [F.asc("v"), F.asc("k")]
    got = prefix_sum(
        df,
        order,
        F.col("k").cast("long"),  # exact integer sums: equality is bitwise
        "cum",
        num_partitions=8,
        bucket_expr=F.col("v"),
    )
    want = _naive(df, order, F.col("k").cast("long"), "cum")
    assert _rows(got, ["k"]) == _rows(want, ["k"])
    # the join output keeps the window's hash(bucket) partitioning:
    # count rows per physical partition of the returned frame
    shares = (
        got.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    mx = max(r["count"] for r in shares)
    assert mx <= n * 0.15, f"max partition share {mx}/{n}"


def test_pid_assignment_is_pinned_by_checkpoint(spark):
    """The local-sums and offsets branches must read ONE materialized
    pid assignment (prefix.py INVARIANT comment): repartitionByRange
    samples boundaries per physical exchange, so split lineage could
    give the branches different pids and silently corrupt totals. The
    operator pins the assignment with a lazy localCheckpoint — assert
    the checkpoint truncation is actually in the plan (both branches
    scan the SAME existing RDD, not two fresh exchanges), and that the
    result matches the naive window. Unlike persist, the checkpoint
    needs no cache_scope: ContextCleaner frees the blocks once the
    result DataFrame is dropped, so bare call sites cannot leak."""
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 13) % 17).alias("v")
    )
    got = prefix_sum(df, [F.asc("k")], F.col("v"), "cum", num_partitions=8)
    # lineage is cut at the checkpoint: the executed plan scans the
    # pinned RDD and contains NO range exchange of its own
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "rangepartitioning" not in plan.lower()
    want = _naive(df, [F.asc("k")], F.col("v"), "cum")
    assert _rows(got, ["k"]) == _rows(want, ["k"])
