"""As-of (point-in-time) join — an operator Spark's join surface lacks.

The reference's analysts would emulate this in MySQL with a correlated
"latest row before" subquery per left row (delegated via
/root/reference/src/loader.py:231); neither engine has a native form
(DuckDB, our oracle, does: ASOF JOIN).

Scale design — sort-based, not range-join based: tag both inputs, union
them, and take ``last(right_payload, ignorenulls=True)`` over a window
sorted by (ts, side) per key. That is ONE shuffle on the join keys and an
O(n log n) per-partition sort — no BroadcastNestedLoopJoin, no
per-left-row range scan, no candidate blow-up. At 100 TB both sides
shuffle-partition on the key; skewed keys are split by AQE like any other
sort/window. This is the same plan shape Flink/kdb use for temporal joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    how: str = "inner",
    tolerance_s: float | None = None,
    right_order: Column | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the single matching right row:

    - ``direction='backward'``: latest right row with right_ts <= left_ts
    - ``direction='forward'``: earliest right row with right_ts >= left_ts

    matching on the ``on`` equi-keys. ``right_order`` breaks ties among
    right rows sharing the same timestamp (default: the timestamp itself,
    i.e. arbitrary — pass a unique id for determinism). ``tolerance_s``
    drops matches farther than that many seconds. ``how`` is 'inner'
    (drop unmatched left rows, like ASOF JOIN) or 'left'.

    Output: all left columns, then the right timestamp as
    ``{right_prefix}{right_ts}`` and each right payload column (renamed
    with ``right_prefix`` only on collision with a left column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    payload_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_ts = f"{right_prefix}{right_ts}"
    out_names = {
        c: (f"{right_prefix}{c}" if c in left.columns else c) for c in payload_cols
    }

    r_struct = F.struct(
        F.col(right_ts).alias(out_ts),
        *[F.col(c).alias(out_names[c]) for c in payload_cols],
    )
    # Tie-break among right rows sharing a timestamp; without an explicit
    # order the pick is arbitrary (like ASOF JOIN), so a constant is fine.
    ord_col = right_order if right_order is not None else F.lit(0.0)

    l_struct_type = left.select(F.struct(*left.columns).alias("__l")).schema["__l"].dataType
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType

    l_tagged = left.select(
        *[F.col(c).alias(f"__k_{c}") for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("double").alias("__ord"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c).alias(f"__k_{c}") for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        ord_col.cast("double").alias("__ord"),
        F.lit(None).cast(l_struct_type).alias("__l"),
        r_struct.alias("__r"),
    )

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__ord").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__ord").desc()]
    w = (
        Window.partitionBy(*[f"__k_{c}" for c in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        gap = F.abs(
            F.expr(f"timestampdiff(MICROSECOND, __match.{out_ts}, __ts)")
        ) / F.lit(1_000_000.0)
        matched = matched.withColumn(
            "__match", F.when(gap <= tolerance_s, F.col("__match"))
        )
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())

    out = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out.append(F.col(f"__match.{out_ts}").alias(out_ts))
    out.extend(F.col(f"__match.{out_names[c]}").alias(out_names[c]) for c in payload_cols)
    return matched.select(*out)
