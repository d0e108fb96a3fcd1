"""Local sink backends: CSV directory, parquet directory, temp views.

Each write is mode('overwrite') — the Spark-native create-or-replace that
matches the reference's update-else-create upsert (loader.py:168-179).
CSV keeps header=True to mirror the reference's spool format
(loader.py:240: header row first).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class _DirSinkPathMixin:
    """Shared output-path contract: one directory per output name, under
    ``self.root`` — the hook the pipeline's A13 size reporting duck-types
    on (runner._run_one)."""

    root: str

    def path_for(self, name: str) -> str:
        return os.path.join(self.root, name)


class CsvDirSink(_DirSinkPathMixin):
    """Distributed CSV writer: one directory per output name.

    The reference stringifies every value into a single client-side CSV
    (loader.py:238-246) — a driver bottleneck at scale. Here executors
    write partitioned CSV; set coalesce=1 only when a single file is
    required by the consumer.
    """

    def __init__(self, root: str, coalesce: int | None = None):
        self.root = root
        self.coalesce = coalesce

    def write(self, df: DataFrame, name: str) -> None:
        out = df.coalesce(self.coalesce) if self.coalesce else df
        out.write.mode("overwrite").option("header", True).csv(self.path_for(name))


class ParquetDirSink(_DirSinkPathMixin):
    """Parquet-per-name sink — the engine-native interchange format.

    ``partition_by`` enables hive-style directory partitioning so
    downstream readers get partition pruning (the 100 TB layout: partition
    on the dominant filter column, e.g. date).

    ``sort_by`` sorts within each output partition before writing, so the
    parquet min/max stats on those columns become selective (row-group
    data skipping — free read-side pruning at any scale)."""

    def __init__(
        self,
        root: str,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
    ):
        self.root = root
        self.partition_by = partition_by
        self.sort_by = sort_by

    def write(self, df: DataFrame, name: str) -> None:
        if self.sort_by:
            df = df.sortWithinPartitions(*self.sort_by)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(os.path.join(self.root, name))


class TempViewSink:
    """Register results as temp views (folder-as-catalog output analog)."""

    def write(self, df: DataFrame, name: str) -> None:
        df.createOrReplaceTempView(name)


class JsonDirSink(_DirSinkPathMixin):
    """JSON-lines-per-name sink (interchange with downstream tooling)."""

    def __init__(self, root: str, coalesce: int | None = None):
        self.root = root
        self.coalesce = coalesce

    def write(self, df: DataFrame, name: str) -> None:
        out = df.coalesce(self.coalesce) if self.coalesce else df
        out.write.mode("overwrite").json(os.path.join(self.root, name))


class OrcDirSink(_DirSinkPathMixin):
    """ORC-per-name sink — columnar interchange with Hive/Trino stacks
    (same pushdown/stats story as parquet; Spark's ORC writer is
    built in, no extra packages)."""

    def __init__(self, root: str, partition_by: list[str] | None = None):
        self.root = root
        self.partition_by = partition_by

    def write(self, df: DataFrame, name: str) -> None:
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.orc(os.path.join(self.root, name))
