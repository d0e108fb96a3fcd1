"""Declarative data-quality checks — the pre-publish assertions an ETL
tool runs before shipping results (the reference ships whatever MySQL
returns; its only guard is output size, loader.py:250-253).

Each check is one aggregate returning (check, status, n_violations);
``run_checks`` unions them into a single report DataFrame. Every check is
a plain aggregation — one scan each, map-side partials, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report(df: DataFrame, check: str, violations) -> DataFrame:
    v = violations.cast("bigint")
    return df.agg(
        F.lit(check).alias("check"),
        F.when(v == 0, "pass").otherwise("fail").alias("status"),
        v.alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Duplicates = sum of (group size - 1) over key groups.

    groupBy keeps NULL keys as their own group, so a lone NULL-keyed row
    is NOT a violation and two identical NULL-keyed rows count as one —
    the countDistinct formulation (COUNT(*) - COUNT(DISTINCT cols)) got
    both wrong because countDistinct skips NULL-containing rows."""
    grouped = df.groupBy(*[F.col(c) for c in cols]).agg(F.count("*").alias("__n"))
    dup = F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
    return _report(grouped, name or f"unique({','.join(cols)})", dup)


def check_non_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    nulls = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
    return _report(df, name or f"non_null({col})", F.coalesce(nulls, F.lit(0)))


def check_in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> DataFrame:
    bad = F.sum(
        F.when(F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    )
    return _report(df, name or f"in_range({col},[{lo},{hi}])", F.coalesce(bad, F.lit(0)))


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Orphan child keys (anti-join against the parent key set)."""
    orphans = child.join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        child_col,
        "left_anti",
    )
    return _report(
        orphans, name or f"ref({child_col}->{parent_col})", F.count("*")
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the single-row check reports into one report table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive content checksum of selected columns: every row
    is canonically serialized ('|'-joined strings), hashed to a 60-bit
    md5 prefix (the engine-portable family), and the hashes are SUMMED in
    wide decimal — addition commutes, so the result is independent of row
    order and partitioning, and two engines (or two pipeline runs)
    producing the same content produce the same checksum.

    The tool every migration/CDC pipeline needs: one scan + a one-row
    aggregate, no sort, no collect, no shuffle beyond the final reduce.
    Callers pick columns whose string forms are engine-stable (ints,
    strings, dates, decimals — raw doubles format differently across
    engines; round or cast them first)."""
    row_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("decimal(38,0)")
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"),
    )
