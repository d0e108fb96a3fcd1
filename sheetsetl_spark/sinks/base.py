"""Sink contract + output-size guard.

Guard semantics mirror /root/reference/src/loader.py:238-253 exactly:
total_cells = (row_count + 1 header row) * column_count, and the result
is REJECTED when total_cells >= limit (the reference skips the upload and
moves on; our pipeline catches CellLimitExceeded and does the same).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame

#: Google Sheets hard limit the reference enforces (loader.py:250, README.md:60-61).
DEFAULT_CELL_LIMIT = 2_000_000


class CellLimitExceeded(Exception):
    def __init__(self, name: str, cells: int, limit: int):
        self.name, self.cells, self.limit = name, cells, limit
        super().__init__(f"{name}: {cells} cells >= limit {limit}")


def cell_count_guard(df: DataFrame, name: str, limit: int = DEFAULT_CELL_LIMIT) -> int:
    """Count output cells ((rows + header) * cols, loader.py:241-246) and
    raise if the sink limit is hit. Returns the row count.

    The count() here is a deliberate pre-sink action — one cheap
    aggregate job (Catalyst collapses it to a metadata/count-star plan
    where possible) instead of the reference's count-while-spooling.
    """
    rows = df.count()
    cells = (rows + 1) * len(df.columns)
    if cells >= limit:
        raise CellLimitExceeded(name, cells, limit)
    return rows


@runtime_checkable
class Sink(Protocol):
    """Create-or-replace a named output (upsert identity = name, mirroring
    loader.py:159-179's (folder, name, mime) lookup)."""

    def write(self, df: DataFrame, name: str) -> None: ...


def human_bytes(size: int) -> str:
    """Human-readable byte size — behavioral parity with the reference's
    ``convert_size`` (loader.py:61-75: 1024 base, 2-decimal round, B..YB
    units), used by the pipeline report the way the reference logs each
    query's spool size before upload (loader.py:247-249)."""
    import math

    if size == 0:
        return "0B"
    units = ("B", "KB", "MB", "GB", "TB", "PB", "EB", "ZB", "YB")
    i = int(math.floor(math.log(size, 1024)))
    return f"{round(size / 1024 ** i, 2)} {units[i]}"


def dir_bytes(path: str) -> int:
    """Total bytes under a sink output path (file or directory)."""
    import os

    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total
