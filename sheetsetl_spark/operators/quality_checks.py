"""Declarative data-quality constraint checking (Deequ-style
unit-tests-for-data), complementing :mod:`profiling`'s descriptive
summary with pass/fail CONTRACTS: an ETL pipeline like the reference's
(/root/reference/src/loader.py:223-255 — which publishes whatever MySQL
returns, unvalidated) gains a verification gate between "query ran" and
"sheet published".

Each constraint compiles to aggregate expressions; all ROW-LEVEL checks
(not-null, bounds, accepted values, custom predicates) fold into ONE
single-scan aggregate with map-side partials, so a 50-constraint suite
costs one corpus pass. Uniqueness adds one keyed aggregate per
constraint; referential integrity one anti-join (key-shuffled, AQE
broadcasts the dim side while it fits). The report is a tiny
(1 row per constraint) DataFrame — fully SQL-expressible, so the whole
checker is DuckDB-oracle-checkable (query ``c47_data_quality_report``).

API::

    # (column is check_name, not "constraint" — a reserved SQL keyword)
    report = check_constraints(orders, [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        in_range("o_totalprice", 0, 1_000_000),
        accepted_values("o_orderstatus", ["F", "O", "P"]),
        satisfies("o_orderdate <= current_date()", name="no_future_orders"),
        referential("o_custkey", customer, "c_custkey"),
    ])
    # -> (check_name, passed, violations) one row per check
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str  # rowlevel | unique | referential
    # rowlevel: a Column counting violating rows inside the shared agg
    violation_count: Column | None = None
    cols: tuple[str, ...] = ()
    other: Any = None  # referential: (other_df, other_col)


def not_null(col: str) -> Constraint:
    return Constraint(
        f"not_null({col})", "rowlevel", F.count_if(F.col(col).isNull())
    )


def in_range(col: str, lo, hi) -> Constraint:
    """Violated by values outside [lo, hi]; NULLs don't violate (pair
    with :func:`not_null` to forbid them — same split as SQL CHECK)."""
    c = F.col(col)
    return Constraint(
        f"in_range({col},{lo},{hi})",
        "rowlevel",
        F.count_if(c.isNotNull() & ((c < lo) | (c > hi))),
    )


def accepted_values(col: str, values: list) -> Constraint:
    c = F.col(col)
    return Constraint(
        f"accepted_values({col})",
        "rowlevel",
        F.count_if(c.isNotNull() & ~c.isin(values)),
    )


def satisfies(predicate_sql: str, name: str) -> Constraint:
    """Custom row predicate (SQL text) that every row must satisfy;
    NULL-valued predicates count as violations (unknown != proven)."""
    p = F.expr(predicate_sql)
    return Constraint(
        f"satisfies({name})", "rowlevel", F.count_if(~F.coalesce(p, F.lit(False)))
    )


def unique(*cols: str) -> Constraint:
    """Duplicate-key rows count as violations (ALL rows of a >1 group).
    NULL keys compare equal here (two NULL-keyed rows violate) — the
    dbt-style uniqueness test, stricter than SQL's UNIQUE constraint
    which exempts NULLs; pair with :func:`not_null` either way."""
    return Constraint(f"unique({','.join(cols)})", "unique", None, tuple(cols))


def referential(col: str, other: DataFrame, other_col: str) -> Constraint:
    """Every non-null value of ``col`` must exist in ``other.other_col``."""
    return Constraint(
        f"referential({col}->{other_col})", "referential", None, (col,),
        (other, other_col),
    )


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints; returns (check_name, passed, violations).

    Deterministic and partitioning-proof (pure counts); the row-level
    tier is one aggregate over one scan no matter how many constraints.
    """
    if not constraints:
        raise ValueError("check_constraints: empty constraint list")
    reports: list[DataFrame] = []

    rowlevel = [c for c in constraints if c.kind == "rowlevel"]
    if rowlevel:
        agg = df.agg(
            *[c.violation_count.alias(f"v{i}") for i, c in enumerate(rowlevel)]
        )
        stacked = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name).alias("check_name"),
                        F.col(f"v{i}").cast("bigint").alias("violations"),
                    )
                    for i, c in enumerate(rowlevel)
                ]
            )
        )
        reports.append(agg.select(stacked.alias("e")).select("e.*"))

    for c in constraints:
        if c.kind == "unique":
            dup = (
                df.groupBy(*[F.col(k) for k in c.cols])
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("violations"))
                .select(F.lit(c.name).alias("check_name"), "violations")
            )
            reports.append(dup)
        elif c.kind == "referential":
            other, other_col = c.other
            col = c.cols[0]
            missing = (
                df.select(F.col(col)).filter(F.col(col).isNotNull())
                .join(
                    other.select(F.col(other_col).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .agg(F.count("*").cast("bigint").alias("violations"))
                .select(F.lit(c.name).alias("check_name"), "violations")
            )
            reports.append(missing)

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "check_name", (F.col("violations") == 0).alias("passed"), "violations"
    )
