"""Incremental computation: aggregate merge and CDC apply.

The reference refreshes outputs by full re-run under cron
(/root/reference/README.md:38-43) — every sheet recomputes from scratch.
These operators are the incremental upgrade: merge only the new data into
a materialized aggregate, or apply a change log to a snapshot, both exact.

Scale: a day's delta is orders of magnitude smaller than the 100 TB
history; merging partials costs O(delta + groups) instead of O(history).
The decimal-sum determinism contract is what makes the merge EXACT —
decimal partials are associative, so merged results equal full
recomputation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_aggregates(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "cnt",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Merge two partial aggregates that share the schema
    (keys..., count_col, sum_cols...): counts add, decimal sums add.
    ``full == merge(agg(old), agg(new))`` exactly — averages and other
    ratios derive downstream from (sum, count)."""
    sum_cols = sum_cols or []
    merged = existing.unionByName(delta)
    aggs = [F.sum(count_col).alias(count_col)]
    aggs += [F.sum(c).alias(c) for c in sum_cols]
    return merged.groupBy(*keys).agg(*aggs)


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_cols: list,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC log to a snapshot: for each key take the latest change
    row (by ``order_cols``); a delete drops the key, an upsert replaces
    the snapshot row. Unchanged snapshot keys pass through.

    One window over the changes + one outer join against the snapshot —
    the MERGE INTO primitive as a composition, exact and idempotent.
    Output schema = snapshot schema (change rows must carry those columns).
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_cols])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    value_cols = [c for c in snapshot.columns if c not in keys]
    ch = latest.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    cond = [snapshot[k].eqNullSafe(ch[f"__k_{k}"]) for k in keys]
    joined = snapshot.join(ch, cond, "full_outer")
    kept = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != delete_op)
    )
    out_cols = []
    for k in keys:
        out_cols.append(F.coalesce(snapshot[k], F.col(f"__k_{k}")).alias(k))
    for c in value_cols:
        out_cols.append(
            F.when(F.col("__op").isNotNull(), F.col(f"__v_{c}"))
            .otherwise(snapshot[c])
            .alias(c)
        )
    return kept.select(*out_cols)


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    attr_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build SCD Type-2 validity intervals from a change log: per key,
    collapse consecutive rows with identical ``attr_cols`` into one
    interval [valid_from, valid_to), valid_to = next interval's start
    (null on the open current interval, is_current = 1).

    Gaps-and-islands entirely in window functions: one change flag via
    null-safe lag comparison, one running sum to number islands, one
    groupBy for interval bounds, one lead for valid_to — three
    window passes + one partial agg, all partitioned on the key, so the
    whole history build is a single shuffle by key at any scale. The
    reference's cron refresh (/root/reference/README.md:38-43) overwrites
    history in place; this is the lossless alternative.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lag(ts_col).over(w).isNull()
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    islands = changes.withColumn("__chg", changed.cast("int")).withColumn(
        "__island",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    ivals = islands.groupBy(*keys, "__island", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"), F.count("*").alias("n_rows")
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from", "__island")
    return (
        ivals.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .drop("__island")
    )


def time_decayed_agg(
    events: DataFrame,
    group_col: str,
    value_col: str = "value",
    ts_col: str = "ts",
    half_life_days: float = 7.0,
) -> DataFrame:
    """Exponentially time-decayed aggregate: the feature-store primitive
    where recent activity counts more (weight = 2^(-age/half_life),
    anchored at the corpus' newest event date so the result is a pure
    function of the data).

    Determinism contract: age is an exact integer day difference, each
    contribution value*weight rounds to 6 dp, the per-group total
    accumulates in exact DECIMAL — partition-order free, hash-stable.

    Scale: one scan, the anchor is a broadcast one-row aggregate, one
    map-side-combining group shuffle. Output: (group, decayed_value,
    raw_value, n_events).
    """
    import math

    from sheetsetl_spark.operators.text import round6_bin

    lam = -math.log(2.0) / half_life_days
    anchor = events.agg(F.max(F.to_date(ts_col)).alias("__anchor"))
    age = F.datediff(F.col("__anchor"), F.to_date(ts_col))
    # round6_bin, not F.round: the oracle spells the FLOOR form, and the
    # two diverge on negative values at the .5 boundary (fixture values
    # happen to be >= 0 today; the operator shouldn't depend on that).
    contrib = round6_bin(F.col(value_col) * F.exp(F.lit(lam) * age))
    raw = round6_bin(F.col(value_col))
    return (
        events.crossJoin(F.broadcast(anchor))
        .groupBy(group_col)
        .agg(
            F.sum(contrib.cast("decimal(28,6)")).cast("double").alias("decayed_value"),
            F.sum(raw.cast("decimal(28,6)")).cast("double").alias("raw_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(group_col)
    )


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Exponentially-weighted moving average per key — the monitoring
    smoother (drift dashboards, rate limiting, trend alerts) over a
    per-key ordered series: s_t = alpha*x_t + (1-alpha)*s_{t-1}, s_0=0.

    A sequential recurrence has no shuffle-parallel form, so the design
    constraint is that the per-key SERIES is bounded (daily aggregates
    per key: calendar-bounded, like the Mann-Kendall trend operator) —
    then collect_list per key is a bounded array and the fold runs
    JVM-side via `aggregate` over the day-sorted array. The corpus-sized
    work (the daily pre-aggregation) stays a map-side-combined groupBy;
    only the bounded (key, day)-level frame ever enters a window-free
    fold. Determinism: the fold is DEFINED sequential (left-to-right in
    day order), so the same IEEE double ops run in the same order on
    any partitioning — and in the DuckDB twin (list_reduce over
    list_prepend(0.0, list(x ORDER BY day)) — bit-identical.

    Output: (key, n_points, ewma) — the final smoothed level, rounded 6.
    """
    one_minus = 1.0 - alpha
    return (
        df.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(order_col, value_col))
                        ),
                        lambda s: s[value_col].cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: F.lit(alpha) * x + F.lit(one_minus) * acc,
                ),
                6,
            ).alias("ewma"),
        )
    )


def holt_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key:

        l_t = 0.5*x_t + 0.5*(l_{t-1} + t_{t-1})
        b_t = 0.5*(l_t - l_{t-1}) + 0.5*b_{t-1},   l_0 = b_0 = 0

    — the level-AND-slope upgrade of :func:`ewma_by_key` (which tracks
    level only and lags every trend). The smoothing constants are
    EXACTLY 0.5 on purpose: multiplying a double by 0.5 is exact in
    IEEE-754, so the only rounding in the whole recurrence is the
    additions — and those run in the same defined left-to-right order
    in both engines, keeping the chain bit-identical to a DuckDB
    recursive-CTE twin without any libm dependence.

    Same scale contract as ewma_by_key: a sequential recurrence has no
    shuffle-parallel form, so the per-key SERIES must be bounded
    (calendar-bounded daily aggregates). The corpus-sized work is the
    upstream daily pre-aggregation; the fold runs JVM-side via
    `aggregate` over the day-sorted array, carrying [level, trend] as
    a 2-element array accumulator.

    Output: (key, n_points, level, trend, forecast_7) — the final
    smoothed level/slope and the 7-steps-ahead linear forecast
    level + 7*trend, each 6dp-rounded via the portable FLOOR form.
    """
    from sheetsetl_spark.operators.text import round6_bin

    def step(acc, x):
        new_level = F.lit(0.5) * x + F.lit(0.5) * (acc[0] + acc[1])
        new_trend = (
            F.lit(0.5) * ((F.lit(0.5) * x + F.lit(0.5) * (acc[0] + acc[1])) - acc[0])
            + F.lit(0.5) * acc[1]
        )
        return F.array(new_level, new_trend)

    folded = df.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_points"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(order_col, value_col))),
                lambda s: s[value_col].cast("double"),
            ),
            F.array(F.lit(0.0), F.lit(0.0)),
            step,
        ).alias("lt"),
    )
    return folded.select(
        key_col,
        "n_points",
        round6_bin(F.col("lt")[0]).alias("level"),
        round6_bin(F.col("lt")[1]).alias("trend"),
        round6_bin(F.col("lt")[0] + F.lit(7.0) * F.col("lt")[1]).alias(
            "forecast_7"
        ),
    )
