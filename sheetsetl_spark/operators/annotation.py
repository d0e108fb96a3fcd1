"""Annotation / label aggregation — the RLHF-and-labeling tier of a
training-data pipeline: collapse many noisy annotator judgments per
example into one consensus label, and measure how much the annotators
actually agree (so a curation pipeline can route low-agreement examples
to re-review instead of silently training on coin flips).

Both operators are single-scan groupBy/window programs: majority vote is
one shuffle on (example, label) then a per-example window; the
agreement statistic is two global aggregates over the same counts frame.
At 100 TB the per-example label-count frame is bounded by
|examples| x |label vocabulary|, and nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def majority_vote(
    df: DataFrame,
    example_col: str,
    annotator_col: str,
    label_col: str,
) -> DataFrame:
    """Consensus label per example: the modal label, ties broken by the
    lexicographically SMALLEST modal label (deterministic — a random or
    partition-order tiebreak would make the training set unreproducible).

    Output: (example, label, votes, n_annotations, agreement) where
    agreement = votes / n_annotations rounded to 6 dp. Duplicate
    (example, annotator) rows count once — an annotator revising their
    judgment must not get two votes; the latest-wins policy is the
    caller's concern (see operators/dedup.py::dedup_latest), here the
    distinct pair is counted.

    Plan: distinct on (example, annotator, label) -> count per
    (example, label) -> row_number over the example partition ordered by
    (votes DESC, label ASC). Two shuffles on the example key, both
    map-side combinable; group width is the label vocabulary, which for
    annotation tasks is small and bounded.
    """
    votes = (
        df.select(
            F.col(example_col).alias("example"),
            F.col(annotator_col).alias("annotator"),
            F.col(label_col).alias("label"),
        )
        .distinct()
        .groupBy("example", "label")
        .agg(F.count("*").alias("votes"))
    )
    totals = Window.partitionBy("example")
    ranked = votes.select(
        "example",
        "label",
        "votes",
        F.sum("votes").over(totals).alias("n_annotations"),
        F.row_number()
        .over(totals.orderBy(F.col("votes").desc(), F.col("label").asc()))
        .alias("__rank"),
    )
    return ranked.filter(F.col("__rank") == 1).select(
        "example",
        "label",
        "votes",
        "n_annotations",
        F.round(F.col("votes") / F.col("n_annotations"), 6).alias("agreement"),
    )


def agreement_statistic(
    df: DataFrame,
    example_col: str,
    annotator_col: str,
    label_col: str,
) -> DataFrame:
    """Corpus-level chance-corrected inter-annotator agreement — the
    generalized Fleiss/Scott form kappa = (Po - Pe) / (1 - Pe) with

      Po = mean over examples of  sum_j n_ij (n_ij - 1) / (n_i (n_i - 1))
      Pe = sum_j p_j^2,  p_j = global share of label j

    (public formula, Fleiss 1971), computed over whatever raters each
    example actually has (examples with a single rating carry no pairwise
    information and are excluded from Po, the standard generalization).

    Output: one row (po, pe, kappa, n_examples, n_ratings), floats
    rounded to 6 dp. Per-example terms round to 6 dp first and sum in
    exact decimal so the result is partition-order independent.

    Plan: the same (example, label) count frame as majority_vote, one
    per-example aggregate, then two scalar aggregates cross-joined —
    everything map-side combinable, output is one row.
    """
    pairs = df.select(
        F.col(example_col).alias("example"),
        F.col(annotator_col).alias("annotator"),
        F.col(label_col).alias("label"),
    ).distinct()
    counts = pairs.groupBy("example", "label").agg(F.count("*").alias("nij"))
    per_example = counts.groupBy("example").agg(
        F.sum("nij").alias("ni"),
        F.sum(F.col("nij") * (F.col("nij") - 1)).alias("same_pairs"),
    )
    po_frame = per_example.filter(F.col("ni") > 1).select(
        F.round(
            F.col("same_pairs") / (F.col("ni") * (F.col("ni") - 1)), 6
        ).alias("po_i")
    )
    po_agg = po_frame.agg(
        (
            F.sum(F.col("po_i").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("po_raw"),
        F.count("*").alias("n_examples"),
    )
    label_share = counts.groupBy("label").agg(F.sum("nij").alias("nj"))
    pe_agg = label_share.agg(
        F.sum("nj").alias("n_ratings"),
        F.sum(F.col("nj") * F.col("nj")).alias("sq_sum"),
    ).select(
        "n_ratings",
        (F.col("sq_sum") / (F.col("n_ratings") * F.col("n_ratings"))).alias(
            "pe_raw"
        ),
    )
    return po_agg.crossJoin(pe_agg).select(
        F.round("po_raw", 6).alias("po"),
        F.round("pe_raw", 6).alias("pe"),
        F.round(
            (F.col("po_raw") - F.col("pe_raw")) / (1.0 - F.col("pe_raw")), 6
        ).alias("kappa"),
        "n_examples",
        "n_ratings",
    )
