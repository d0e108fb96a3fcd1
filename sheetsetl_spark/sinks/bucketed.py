"""Bucketed-table sink: pre-shuffled, co-located join layout.

At 100 TB the biggest recurring cost is re-shuffling fact tables for
every join on the same key. Bucketing pays that shuffle once at write
time: both sides stored bucketed by the join key join with NO exchange
(sort-merge over pre-bucketed files). This sink materializes results as
bucketed managed tables for exactly that pattern (e.g. lineitem/orders
bucketed by orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class BucketedTableSink:
    def __init__(self, num_buckets: int, bucket_cols: list[str], sort_cols: list[str] | None = None):
        self.num_buckets = num_buckets
        self.bucket_cols = bucket_cols
        self.sort_cols = sort_cols or bucket_cols

    def write(self, df: DataFrame, name: str) -> None:
        (
            df.write.mode("overwrite")
            .bucketBy(self.num_buckets, *self.bucket_cols)
            .sortBy(*self.sort_cols)
            .saveAsTable(name)
        )
