"""Plan-shape assertions for the round-4 batch-2 queries: the scale
contracts their docstrings claim (zero-shuffle lambda projections,
broadcast calibration scalars, single-fact-shuffle aggregations) must be
visible in the executed plan, not just asserted in prose."""

from __future__ import annotations

from sheetsetl_spark.queries import QUERIES
from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_higher_order_arrays_zero_shuffle(spark):
    """b63 is a narrow per-row projection: no Exchange anywhere, and the
    parquet scan reads only the three needed columns."""
    df = QUERIES["b63_higher_order_arrays"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "Exchange" not in plan, plan
    scan_line = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "embedding" in scan_line


def test_regression_aggregates_single_shuffle(spark):
    """x50's moments reduce in one hash aggregate: exactly one Exchange
    (the groupBy), with a map-side partial before it."""
    df = QUERIES["x50_regression_aggregates"](spark, SF_SMALL)
    df.collect()
    # AQE prints Final and Initial plans; count shuffles in the final only
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_chi_square_margins_broadcast(spark):
    """x57 joins the cell table to its margins and grand total without a
    sort-merge join — margins are broadcast, the grand total enters via
    BroadcastNestedLoopJoin."""
    df = QUERIES["x57_chi_square_contingency"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_perplexity_buckets_broadcast_cutoffs(spark):
    """c39's tercile cutoffs are a one-row calibration joined back by
    broadcast — the document stream must not sort-merge against it."""
    df = QUERIES["c39_perplexity_buckets"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_repeated_ngram_spans_no_python(spark):
    """c40's sliding spans are Catalyst lambdas: no Python evaluation
    node (the UDF slow path) appears anywhere in the plan."""
    df = QUERIES["c40_repeated_ngram_spans"](spark, SF_SMALL)
    plan = _executed_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan


def test_interpolation_windows_run_on_daily_series(spark):
    """x59's unkeyed windows are legal only because they run over the
    calendar-bounded daily aggregate: the raw events must be aggregated
    BEFORE any single-partition Exchange appears."""
    df = QUERIES["x59_linear_interpolation"](spark, SF_SMALL)
    plan = _executed_plan(df)
    lines = plan.splitlines()
    single = next(
        (i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln), None
    )
    assert single is not None  # the spine/window stage exists
    # below (upstream of) that Exchange there is a HashAggregate — the
    # daily rollup happens before the series is narrowed to one partition
    assert any("HashAggregate" in ln for ln in lines[single:]), plan


def test_bm25_topk_is_take_ordered(spark):
    """c26's final top-k must plan as TakeOrderedAndProject (per-partition
    heaps, driver merge) — NOT a row_number over an unpartitioned Window,
    which would funnel every candidate document through one task at
    100 TB (the r4 verdict's one flagged scale-killer)."""
    df = QUERIES["c26_bm25_search"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    # no unpartitioned-Window funnel: the only acceptable
    # SinglePartition narrowing is the TakeOrdered driver merge itself
    assert "Window" not in plan, plan


def test_duplicated_passages_no_python_and_keyed_windows(spark):
    """c45 is Catalyst-only (lambda gram windows, no UDF) and its only
    Window is PER-DOCUMENT — no unpartitioned data window anywhere."""
    df = QUERIES["c45_duplicated_passages"](spark, SF_SMALL)
    plan = _executed_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_hard_negatives_broadcasts_query_side(spark):
    """c46 streams the corpus against a broadcast query set: the pair
    stage must be a BroadcastNestedLoopJoin (no corpus-wide SortMergeJoin
    for candidate generation)."""
    df = QUERIES["c46_hard_negatives"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_r5_analyst_queries_stay_jvm_side(spark):
    """x68/x69/x70 are pure Catalyst programs: no Python evaluation node,
    and no unpartitioned data window — funnel steps and cohort anchors
    are keyed aggregations/joins."""
    for name in (
        "x68_funnel_conversion",
        "x69_cohort_retention",
        "x70_order_reconciliation",
    ):
        df = QUERIES[name](spark, SF_SMALL)
        plan = _executed_plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, (name, plan)
        assert "Window" not in plan, (name, plan)


def test_partsupp_canonical_plans_no_data_sized_nested_loops(spark):
    """x72-x76 (canonical partsupp forms): the only nested-loop joins in
    the executed plans are the partsupp CTE's own cross joins against a
    1-row COUNT scalar and the literal 4-row VALUES — every line is a
    'Cross' BNLJ, never a theta-join fallback, and no CartesianProduct
    anywhere. Data-sized joins must plan as hash/sort-merge."""
    for name in (
        "x72_q2_min_cost_supplier",
        "x73_q9_product_profit",
        "x74_q11_important_stock",
        "x75_q16_supplier_part_counts",
        "x76_q20_part_promotion",
    ):
        plan = _executed_plan(QUERIES[name](spark, SF_SMALL))
        assert "CartesianProduct" not in plan, (name, plan)
        for ln in plan.splitlines():
            if "BroadcastNestedLoopJoin" in ln:
                assert "Cross" in ln, (name, ln)
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, name


def test_hybrid_rrf_pools_are_take_ordered(spark):
    """c53's two retriever pools must be TakeOrderedAndProject (bounded
    per-partition heaps), and the fusion full-outer join of the two
    bounded pools must not sort-merge a data-sized relation."""
    df = QUERIES["c53_hybrid_rrf_search"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, plan


def test_winnowing_single_doc_shuffle(spark):
    """c54's winnowing selection is one window shuffle on the document
    key plus the per-document aggregates — no join, no Python, and the
    gram stream stays in Catalyst lambdas."""
    df = QUERIES["c54_winnowing_fingerprints"](spark, SF_SMALL)
    df.collect()
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    # every Exchange repartitions on doc_id (window + agg reuse the key)
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "doc_id" in ln, ln


def test_pq_rerank_pushdown_no_join(spark):
    """c55's compressed-domain phase (encode + ADC + shortlist) runs as
    a collected TakeOrdered side job over one mapInArrow corpus pass
    (r12); the returned re-rank plan must therefore read ONLY the
    shortlist rows — a pushed vec_id IN filter on the scan — with no
    join and no shuffle anywhere. A Join or Exchange here means the
    corpus got rescanned or reshuffled for the bounded re-rank."""
    df = QUERIES["c55_topk_cosine_pq"](spark, SF_SMALL)
    df.collect()
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "INSET" in plan or "In(vec_id" in plan, plan


def test_bloom_probe_never_shuffles(spark):
    """c59's probe stream must be pruned in place: every join on the
    probe path is a BroadcastHashJoin and the lineitem side reaches the
    final aggregate with only its own groupBy Exchange."""
    df = QUERIES["c59_bloom_prefilter"](spark, SF_SMALL)
    df.collect()
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan, plan
    # all four joins (3 bloom positions + the truth annotation) broadcast
    assert plan.count("BroadcastHashJoin") == 4, plan
    # the only hash Exchanges are on the BOUNDED sides (bits dedup /
    # true-keys dedup) and the final group aggregate — never a shuffle
    # of the probe stream itself
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert (
                "pos#" in ln or "l_orderkey#" in ln or "l_returnflag" in ln
            ), ln


def test_weighted_sample_zero_shuffle(spark):
    """c61 is per-row hashing + TakeOrdered: no Exchange, no join, and
    the parquet scan reads only the two needed columns."""
    df = QUERIES["c61_weighted_sample"](spark, SF_SMALL)
    plan = _executed_plan(df)
    assert "Exchange" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    scan_line = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "doc_id" in scan_line and "n_chars" in scan_line
    assert "text" not in scan_line  # column pruning reached the scan


def test_time_decay_single_group_shuffle(spark):
    """c62: broadcast anchor + exactly one hash Exchange (the group
    aggregate) with a map-side partial before it."""
    df = QUERIES["c62_time_decayed_agg"](spark, SF_SMALL)
    df.collect()
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_sum" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # one-row anchor
