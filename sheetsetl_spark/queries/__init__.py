"""Named query catalog — the driver-checkable operator inventory.

Every operator row in SURVEY.md §2 (B-series: the MySQL SELECT surface the
reference delegates at /root/reference/src/loader.py:231; C-series: the
LLM-data-pipeline extensions) registers here as

    name -> callable(spark, sf_dir) -> DataFrame      (QUERIES)
    name -> ANSI SQL string for the DuckDB oracle     (ORACLES)

Queries without an oracle entry (non-SQL-expressible internals, e.g. LSH
signatures) get the driver's weaker rows-only check.

Determinism contract (hash-matching against DuckDB):
- every computed column is aliased identically on both sides;
- float SUM/AVG go through exact DECIMAL(18,6) accumulation, then CAST to
  DOUBLE — decimal addition is order-independent, so Spark's partial
  aggregation over arbitrary partitionings matches DuckDB bit-for-bit;
- rankings always carry a unique tie-break key;
- timestamps are emitted as strings/dates at microsecond-or-coarser
  granularity (events.ts is ns in parquet; both engines floor to us).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def dsum(col: str, alias: str) -> str:
    """SQL fragment: order-independent double sum via exact decimal."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg(col: str, alias: str) -> str:
    """SQL fragment: deterministic double avg = exact-decimal sum / count."""
    return (
        f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({col}), 6) AS {alias}"
    )


# Import side registers all queries.
from sheetsetl_spark.queries import relational  # noqa: E402,F401
from sheetsetl_spark.queries import windows  # noqa: E402,F401
from sheetsetl_spark.queries import setops_subqueries  # noqa: E402,F401
from sheetsetl_spark.queries import scalar_functions  # noqa: E402,F401
from sheetsetl_spark.queries import event_windows  # noqa: E402,F401
from sheetsetl_spark.queries import extensions  # noqa: E402,F401
from sheetsetl_spark.queries import udfs  # noqa: E402,F401
from sheetsetl_spark.queries import recursive  # noqa: E402,F401
from sheetsetl_spark.queries import temporal  # noqa: E402,F401
from sheetsetl_spark.queries import tpch  # noqa: E402,F401
# Round-4 additions register LAST so the rotation in __spark_entry__.py
# reaches longer-waiting entries first (VERDICT r3 next-round item 1).
from sheetsetl_spark.queries import analytics_ext  # noqa: E402,F401
from sheetsetl_spark.queries import analytics_ext2  # noqa: E402,F401
from sheetsetl_spark.queries import pipeline_ext  # noqa: E402,F401
from sheetsetl_spark.queries import analytics_r5  # noqa: E402,F401
# Round-6: canonical partsupp TPC-H five (x72-x76) — registered last so
# the never-verified-first rotation stamps them in r6 while the oldest
# (r2-era) stamps still fill the rest of the driver window.
from sheetsetl_spark.queries import tpch_partsupp  # noqa: E402,F401
# Round-7 batch 2: retrieval fusion / winnowing / PQ — registered last
# for the same never-verified-first rotation reason.
from sheetsetl_spark.queries import retrieval_ext  # noqa: E402,F401
from sheetsetl_spark.queries import graph_ext  # noqa: E402,F401
# Round-7 batch 3: annotation aggregation / divergence / interleave.
from sheetsetl_spark.queries import curation_ext  # noqa: E402,F401
# Round-7 batch 4: graph mining / BPE trainer / LM scoring / events.
from sheetsetl_spark.queries import mining_ext  # noqa: E402,F401
# Round-7 batch 5: prefix-filter exact join / uncertainty / time series.
from sheetsetl_spark.queries import analytics_ext3  # noqa: E402,F401
from sheetsetl_spark.queries import analytics_ext4  # noqa: E402,F401
from sheetsetl_spark.queries import analytics_ext5  # noqa: E402,F401
from sheetsetl_spark.queries import analytics_ext6  # noqa: E402,F401
# Round-8: robust statistics + preference pairs — registered last so
# the 26 not-yet-driver-stamped entries keep their window priority.
from sheetsetl_spark.queries import analytics_ext7  # noqa: E402,F401
# Round-8 batch 15: link prediction / Holt trend / t-closeness.
from sheetsetl_spark.queries import analytics_ext8  # noqa: E402,F401
# Round-11: estimator audits, uncertainty (Poisson bootstrap /
# jackknife), pipeline hygiene — exactly 10 entries, sized so the
# never-verified-first rotation still clears the 40 r5-era stamps in
# the same 50-slot driver window.
from sheetsetl_spark.queries import analytics_ext9  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query", "dsum", "davg"]
