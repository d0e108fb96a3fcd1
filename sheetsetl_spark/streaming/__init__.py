from sheetsetl_spark.streaming.pipeline import (
    UpsertForeachBatch,
    dedup_stream,
    stateful_user_totals,
    read_event_stream,
    sessionized_counts,
    windowed_counts,
)

__all__ = [
    "read_event_stream",
    "windowed_counts",
    "sessionized_counts",
    "dedup_stream",
    "stateful_user_totals",
    "UpsertForeachBatch",
]
