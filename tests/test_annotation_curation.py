"""Unit tests for the round-7 batch-3 operators: majority vote,
agreement statistic, distribution divergence, curriculum interleave,
and MAD outliers — semantic edges the sf-fixture oracles can't force
(exact ties, perfect/zero agreement, disjoint distributions, prefix
share guarantees) plus plan-shape checks for the broadcast paths.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sheetsetl_spark.operators import annotation, layout, profiling


def _rows(df):
    return [tuple(r) for r in df.collect()]


# ---------- majority_vote ----------


def test_majority_vote_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame(
        [(1, "a1", "yes"), (1, "a2", "no"), (2, "a1", "no"), (2, "a2", "no")],
        "example int, annotator string, label string",
    )
    out = {r["example"]: r for r in annotation.majority_vote(
        df, "example", "annotator", "label").collect()}
    # 1-1 tie: "no" < "yes" wins deterministically
    assert out[1]["label"] == "no" and out[1]["votes"] == 1
    assert out[1]["n_annotations"] == 2 and out[1]["agreement"] == 0.5
    assert out[2]["label"] == "no" and out[2]["agreement"] == 1.0


def test_majority_vote_dedups_identical_judgments(spark):
    # the same (example, annotator, label) row twice is ONE vote;
    # a conflicting second label from the same annotator is a new vote
    df = spark.createDataFrame(
        [(1, "a1", "yes"), (1, "a1", "yes"), (1, "a1", "no"), (1, "a2", "yes")],
        "example int, annotator string, label string",
    )
    row = annotation.majority_vote(df, "example", "annotator", "label").first()
    assert row["label"] == "yes" and row["votes"] == 2
    assert row["n_annotations"] == 3


# ---------- agreement_statistic ----------


def test_agreement_perfect_gives_kappa_one(spark):
    df = spark.createDataFrame(
        [(e, a, "x" if e == 1 else "y") for e in (1, 2) for a in ("a", "b", "c")],
        "example int, annotator string, label string",
    )
    row = annotation.agreement_statistic(df, "example", "annotator", "label").first()
    assert row["po"] == 1.0 and row["kappa"] == 1.0
    assert row["n_examples"] == 2 and row["n_ratings"] == 6


def test_agreement_excludes_singleton_examples(spark):
    # example 3 has one rating: no pairwise information, excluded from Po
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (3, "a", "y")],
        "example int, annotator string, label string",
    )
    row = annotation.agreement_statistic(df, "example", "annotator", "label").first()
    assert row["n_examples"] == 1 and row["n_ratings"] == 3
    assert row["po"] == 1.0


def test_agreement_matches_hand_computed_fleiss(spark):
    # ex1: x,x,y  ex2: y,y,y  (3 raters each)
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (1, "c", "y"),
         (2, "a", "y"), (2, "b", "y"), (2, "c", "y")],
        "example int, annotator string, label string",
    )
    row = annotation.agreement_statistic(df, "example", "annotator", "label").first()
    # Po = mean(2*1/(3*2), 3*2/(3*2)) = (1/3 + 1) / 2 = 2/3
    # Pe = (2/6)^2 + (4/6)^2 = 5/9
    po, pe = 2 / 3, 5 / 9
    assert row["po"] == round(round(1 / 3, 6) / 2 + round(1.0, 6) / 2, 6)
    assert abs(row["pe"] - pe) < 1e-6
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 1e-5


# ---------- distribution_divergence ----------


def test_divergence_identical_groups_are_zero(spark):
    df = spark.createDataFrame(
        [(g, c) for g in ("g1", "g2") for c in ("a", "a", "b")],
        "grp string, cls string",
    )
    for r in profiling.distribution_divergence(df, "grp", "cls").collect():
        assert r["kl"] == 0.0 and r["js"] == 0.0


def test_divergence_disjoint_group_js_is_ln2(spark):
    # g1 only sees "a", g2 only "b": each group's JS vs the 50/50 corpus
    # is 0.5*ln2 + the absent-mass term 0.5*0.5*ln2 * ... -> compute:
    # p=(1,0), q=(.5,.5): JS = 0.5*1*ln(1/.75) + 0.5*.5*ln(.5/.75)
    #                        + 0.5*.5*ln2 (absent class)
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g2", "b"), ("g2", "b")],
        "grp string, cls string",
    )
    expected_js = round(
        round(0.5 * 1.0 * math.log(1.0 / 0.75)
              + 0.5 * 0.5 * math.log(0.5 / 0.75), 6)
        + round(0.5 * 0.5 * math.log(2.0), 6),
        6,
    )
    expected_kl = round(round(1.0 * math.log(1.0 / 0.5), 6), 6)
    for r in profiling.distribution_divergence(df, "grp", "cls").collect():
        assert r["js"] == expected_js
        assert r["kl"] == expected_kl


# ---------- curriculum_interleave ----------


def test_interleave_prefixes_track_weights(spark):
    df = spark.createDataFrame(
        [("hi", i) for i in range(300)] + [("lo", i) for i in range(100)],
        "src string, id int",
    )
    out = layout.curriculum_interleave(
        df, "src", "id", {"hi": 3.0, "lo": 1.0}
    ).collect()
    # every length-4k prefix holds exactly 3k hi + k lo (stride schedule)
    for k in (1, 5, 25):
        prefix = [r["source"] for r in out[: 4 * k]]
        assert prefix.count("hi") == 3 * k and prefix.count("lo") == k
    # within a source, ids appear in order
    hi_ids = [r["id"] for r in out if r["source"] == "hi"]
    assert hi_ids == sorted(hi_ids)


def test_interleave_excludes_unlisted_sources_and_guards_weights(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "src string, id int"
    )
    out = layout.curriculum_interleave(df, "src", "id", {"a": 1.0}).collect()
    assert [r["source"] for r in out] == ["a"]
    with pytest.raises(ValueError):
        layout.curriculum_interleave(df, "src", "id", {})
    with pytest.raises(ValueError):
        layout.curriculum_interleave(df, "src", "id", {"a": 0.0})


def test_interleave_limit_and_ordinal_are_dense(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(50)], "src string, id int"
    )
    out = layout.curriculum_interleave(df, "src", "id", {"a": 1.0}, limit=7).collect()
    assert [r["ordinal"] for r in out] == list(range(1, 8))


# ---------- plan shapes ----------


def test_mad_outliers_broadcasts_both_aggregate_frames(spark):
    from sheetsetl_spark.queries import QUERIES

    df = QUERIES["x77_mad_outliers"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_divergence_has_no_driver_collect_shape(spark):
    # the per-class frame reduces via window over |classes| rows, not a
    # collect: executed plan contains only Exchange/Window/Aggregate ops
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b")], "grp string, cls string"
    )
    out = profiling.distribution_divergence(df, "grp", "cls")
    assert "CollectLimit" not in out._jdf.queryExecution().executedPlan().toString()
