"""Small-file compaction — table hygiene for streaming/incremental sinks.

Streaming foreachBatch upserts and high-frequency batch runs leave parquet
directories with many tiny files; at 100 TB that kills scan throughput
(footer reads, task-per-file scheduling, no vectorized-read locality).
The reference's analog problem is each cron run rewriting a whole sheet
(/root/reference/src/loader.py:168-183); here compaction makes the
engine-native parquet sinks sustainable instead.

Approach: read the directory, repartition to ceil(bytes / target) output
files, write to a temp sibling path, then atomically swap. The rewrite is
one distributed job; the swap is two renames — readers see either the old
or the new layout, never a partial one.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory into ~target-sized files.

    Returns a report dict: files/bytes before and after. The file count is
    ceil(total_bytes / target) — the 128 MB default matches the scan
    partition size a cluster wants; pass smaller targets for local tests.

    Concurrency contract: SINGLE WRITER, NO CONCURRENT READERS. The swap
    is two renames (path -> old, tmp -> path); between them the directory
    does not exist, and a crash in that window leaves only the ``__old``
    copy to recover by hand. Table formats solve this with manifest
    indirection (Iceberg/Delta commit a new snapshot pointer); for a bare
    parquet directory, schedule compaction when nothing else touches the
    path.
    """
    files_before, bytes_before = parquet_dir_stats(path)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))
    df = spark.read.parquet(path)

    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    # repartition (round-robin) spreads rows evenly across the n_out files
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)

    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

    files_after, bytes_after = parquet_dir_stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
    }
