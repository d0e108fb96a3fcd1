"""Source readers (SURVEY §2-B B1).

The reference reads exactly one kind of input — a MySQL table via the
server connection (/root/reference/src/loader.py:54-58) — plus SQL text
from Drive. Our engine's native source is parquet; CSV/JSON cover the
interchange formats; the JDBC reader gives drop-in parity for deployments
whose data still lives in MySQL (BASELINE.json: "Spark SQL + JDBC source").

Scale posture baked in:
- parquet/CSV/JSON readers keep schema explicit where it matters (no
  driver-side inference jobs on 100 TB inputs);
- the JDBC reader requires a partition column spec for big tables so the
  read parallelizes across executors instead of a single connection, and
  leaves predicate pushdown on (the JDBC source pushes filters into the
  remote WHERE clause — the same work the reference's MySQL did).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Inference costs an extra pass; acceptable for small/medium CSV,
        # pass a schema for anything large.
        reader = reader.option("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options: str
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """Parallel JDBC read (MySQL parity path).

    With a numeric ``partition_column`` + bounds, Spark issues
    ``num_partitions`` range-bounded queries concurrently; without them
    the read is a single connection (only acceptable for dimension-sized
    tables). Filters/projections on the result push down into the remote
    SQL automatically.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetchsize)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC reader (Hive/Trino interchange). Same posture as parquet:
    filters and column pruning push into the ORC scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False, line_sep: str | None = None
) -> DataFrame:
    """Raw text source: one row per line (or per file with
    ``whole_file``) in a single ``value`` column — the entry point for
    unstructured corpora before parsing/chunking (operators/text.py)."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path, wholetext=whole_file)
