"""Table profiling — the data-quality summary an ETL tool surfaces before
shipping results to "spreadsheet type people" (/root/reference/README.md:4).

One aggregation pass computes every column's stats (null count, distinct
count, min/max), then an in-memory unpivot reshapes to one row per column.
At 100 TB this is a single scan with map-side partials; the wide agg row
is a few KB regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Numeric-column profile: (column, n_rows, n_nulls, n_distinct,
    min_val, max_val) — one scan, stack-unpivoted."""
    cols = columns or [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "double", "float", "decimal")
    ]
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack_expr}) AS (column, n_nulls, n_distinct, min_val, max_val)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
