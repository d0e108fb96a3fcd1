"""Local sink backends: CSV directory, parquet directory, temp views.

Each write is mode('overwrite') — the Spark-native create-or-replace that
matches the reference's update-else-create upsert (loader.py:168-179).
CSV keeps header=True to mirror the reference's spool format
(loader.py:240: header row first).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class CsvDirSink:
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
        out.write.mode("overwrite").option("header", True).csv(os.path.join(self.root, name))


class ParquetDirSink:
    """Parquet-per-name sink — the engine-native interchange format."""

    def __init__(self, root: str):
        self.root = root

    def write(self, df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self.root, name))


class TempViewSink:
    """Register results as temp views (folder-as-catalog output analog)."""

    def write(self, df: DataFrame, name: str) -> None:
        df.createOrReplaceTempView(name)
