"""Range (point-in-interval) join — the second temporal join Spark lacks.

A naive ``l.ts >= r.start AND l.ts < r.end`` join plans as
BroadcastNestedLoopJoin (every point against every interval) — fine for a
handful of intervals, quadratic death at 100 TB. The scalable form bins
time: each interval explodes to the bins it covers (≤2 when bin width ≥
interval length), each point maps to exactly one bin, candidates come
from the bin equi-join, and the residual range predicate filters exact
matches. Work is O(points + intervals·bins_per_interval + candidates),
all shuffle-partitioned — the same trick Databricks' range-join hints and
kdb's window joins use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width_s: int,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` via bin bucketing (columns from both inputs
    are preserved; names must not collide).

    ``bin_width_s`` should be >= the typical interval length so each
    interval lands in few bins; correctness never depends on it.
    """
    p_bin = F.floor(F.unix_timestamp(F.col(point_col)) / bin_width_s)
    binned_points = points.withColumn("__bin", p_bin)

    start_bin = F.floor(F.unix_timestamp(F.col(start_col)) / bin_width_s)
    # end is exclusive: the last covered bin holds end - 1s
    end_bin = F.floor((F.unix_timestamp(F.col(end_col)) - 1) / bin_width_s)
    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(start_bin, end_bin))
    )

    return (
        binned_points.join(binned_intervals, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )
