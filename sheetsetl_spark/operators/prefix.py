"""Scalable global prefix sums (running totals) — the 100 TB form of
``SUM(x) OVER (ORDER BY ...)``.

A naive global ordered window funnels EVERY row through one task (Spark
plans ``Window [orderBy ...]`` behind an Exchange SinglePartition) — the
x66/Pareto-class scale-killer named in the r4 verdict. The classic
distributed decomposition used here:

1. **Range-partition** the rows by the order key
   (``repartitionByRange`` — Spark samples boundaries, so partitions are
   balanced even on skewed distributions).
2. **Local prefix sums** per range partition (a window PARTITIONED BY
   the range-partition id — every partition works in parallel).
3. **Partition offsets**: per-partition totals (one tiny row per
   partition) get their own exclusive prefix sum — a bounded
   #partitions-row table — and broadcast back as map-side adds.

The output is a pure function of the data: with a UNIQUE total order
(caller contract, same as every rank in this repo) the decomposition is
exactly the global running sum no matter where the sampled boundaries
fall, so results are deterministic even though boundary placement is
not. Sums accumulate in the caller-provided column type — pass an exact
DECIMAL column for the bit-stable cross-engine contract
(queries/__init__.py).

Cost: 2 balanced shuffles (range exchange + pid clustering) + one
#partitions-row reduction, vs. 1 shuffle into a SINGLE task for the
naive window. At driver scale the naive form wins by a constant; at
100 TB only this one finishes.

Reference parity: the reference ships running-total report SQL verbatim
to MySQL (/root/reference/src/loader.py:231); this operator is the
engine-side replacement for that surface at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ps_pid"
_LOCAL = "__ps_local"
_OFF = "__ps_off"
_TOT = "__ps_tot"


def prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: Column,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` over the global
    order ``order_by`` (inclusive of the current row).

    ``order_by`` must be a UNIQUE total order (add a key column as the
    last tie-break); with ties split across a sampled boundary the
    within-partition/offset decomposition would disagree with the naive
    window. Pass an exact-DECIMAL ``value_col`` when the result feeds a
    cross-engine comparison.
    """
    if not order_by:
        raise ValueError("prefix_sum: order_by must name at least one column")
    if num_partitions is None:
        ranged = df.repartitionByRange(*order_by)
    else:
        ranged = df.repartitionByRange(num_partitions, *order_by)
    # INVARIANT: the local-sums branch and the offsets branch below MUST
    # observe the SAME pid assignment. repartitionByRange samples its
    # boundaries per physical exchange, so if the two branches ever
    # compiled to separate exchanges (exchange reuse disabled, AQE edge
    # cases, nondeterministic upstream), spark_partition_id() could
    # differ between them and the broadcast offsets would silently
    # corrupt the running totals. A lazy localCheckpoint pins ONE
    # materialized assignment that both branches read: lineage is
    # truncated at the checkpoint (a recompute can never re-sample
    # boundaries), and — unlike DataFrame.persist, whose CacheManager
    # entry lives until explicitly unpersisted — the checkpoint blocks
    # are released by Spark's ContextCleaner as soon as the returned
    # DataFrame is dropped, so bare call sites (no cache_scope) cannot
    # leak storage.
    with_pid = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False
    )

    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    local = with_pid.withColumn(_LOCAL, F.sum(value_col).over(w_local))

    totals = with_pid.groupBy(_PID).agg(F.sum(value_col).alias(_TOT))
    # exclusive prefix over the #partitions-row totals table: the ONLY
    # single-partition window in the plan runs over this bounded input
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID, F.coalesce(F.sum(_TOT).over(w_off), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFF))
        .drop(_PID, _LOCAL, _OFF)
    )
