"""Plan-shape assertions for the round-7 batch-4/5/6 queries: the scale
contracts the docstrings claim (no cartesian products on data-sized
relations, semi-join triangle closure, broadcast scalars, Catalyst-only
expressions) must be visible in the executed plan."""

from __future__ import annotations

from sheetsetl_spark.queries import QUERIES
from tests.conftest import SF_SMALL

_PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_triangle_count_semi_join_no_cartesian(spark):
    """c67's wedge closure is a LeftSemi equi-join on (b1, b2); the only
    nested-loop joins are the broadcast one-row stat combinators."""
    df = QUERIES["c67_triangle_count"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "LeftSemi" in plan, plan
    # wedge join + closure are equi-joins (hash or sort-merge), never a
    # non-equi nested loop over data-sized relations
    for ln in plan.splitlines():
        if "BroadcastNestedLoopJoin" in ln:
            assert "BuildRight" in ln or "BuildLeft" in ln


def test_prefix_filter_join_no_cartesian_no_python(spark):
    """c72: prefix candidate generation and verification are equi-joins;
    no cartesian product, no Python nodes."""
    df = QUERIES["c72_prefix_filter_jaccard"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    for marker in _PY_NODES:
        assert marker not in plan, marker


def test_bpe_round_windows_share_one_partitioning(spark):
    """c69: each merge round's greedy-selection windows all partition by
    doc id — after the up-front repartition there is exactly one
    hashpartitioning key in play (id), never an (id, island) exchange."""
    df = QUERIES["c69_bpe_train_apply"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "island" not in plan, plan
    for marker in _PY_NODES:
        assert marker not in plan, marker


def test_rolling_wau_bounded_explode_no_window(spark):
    """x78 computes a rolling COUNT DISTINCT with NO window operator at
    all (SQL cannot window count-distinct; the bounded explode + two
    aggregates replace it)."""
    df = QUERIES["x78_rolling_wau"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "Window" not in plan, plan
    assert "Generate explode" in plan, plan


def test_histogram_quantiles_broadcast_bounds(spark):
    """x84's min/max/count bounds enter as a broadcast one-row aggregate
    (BroadcastNestedLoopJoin), and the corpus is never sorted — the
    only Sort nodes sit under the 100-row window frames."""
    df = QUERIES["x84_histogram_quantiles"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    # no sort-merge join against the corpus
    assert "SortMergeJoin" not in plan, plan


def test_wilson_ranking_take_ordered(spark):
    """x81's top-20 is TakeOrderedAndProject over the aggregate, not a
    global sort of the full per-part table."""
    df = QUERIES["x81_wilson_return_rate"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_kaplan_meier_single_user_shuffle(spark):
    """x82: the only corpus-sized shuffle is the per-user aggregate; the
    curve windows run on duration-grouped (tiny) frames."""
    df = QUERIES["x82_kaplan_meier"](spark, SF_SMALL)
    df.collect()
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan


def test_knn_entropy_broadcast_queries(spark):
    """c73: the 8 query vectors broadcast against the corpus (the c3
    kernel) — no sort-merge join anywhere."""
    df = QUERIES["c73_knn_label_entropy"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
