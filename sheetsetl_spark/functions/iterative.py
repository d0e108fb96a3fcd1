"""Iterative / recursive query support (SURVEY §2-B B42, §7 risk #5).

MySQL 8.0 analysts get ``WITH RECURSIVE``; Spark 4.1 now ships it
natively too (SPARK-24497 — queries/recursive.py b42c runs the same
WITH RECURSIVE text on Spark and DuckDB verbatim). This module remains
the PROGRAMMATIC form: a bounded driver-side fixpoint loop over
DataFrame steps, for iterations SQL can't express (per-step operators,
dynamic convergence predicates) — and b42b pins its semantics equal to
the native CTE. The per-iteration work is fully distributed; only the
(tiny) loop control and emptiness check run on the driver.

Scale notes: each iteration's frontier is localCheckpointed to truncate
lineage (otherwise plan depth grows linearly and planning cost
quadratically); the accumulated result unions lazily and is deduplicated
once per iteration on the (small) frontier, not the full accumulation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterate_fixed_point(
    seed: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    dedup_cols: list[str],
    max_iterations: int = 50,
) -> DataFrame:
    """Semi-naive fixpoint: repeatedly apply ``step`` to the frontier,
    keeping only rows whose ``dedup_cols`` were never seen, until the
    frontier empties or ``max_iterations`` is hit (the recursion bound a
    ``WITH RECURSIVE`` would impose via its own guard).

    Returns the union of all frontiers (the recursive CTE's result set).
    """
    frontier = seed.localCheckpoint(eager=True)
    acc = frontier
    seen = frontier.select(*dedup_cols).distinct().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        produced = step(frontier)
        frontier = (
            produced.join(seen, dedup_cols, "left_anti")
            .dropDuplicates(dedup_cols)
            .localCheckpoint(eager=True)
        )
        if not frontier.take(1):
            break
        acc = acc.unionByName(frontier)
        seen = seen.union(frontier.select(*dedup_cols)).distinct().localCheckpoint(eager=True)
    return acc
