from sheetsetl_spark.streaming.pipeline import (
    DedupIngestForeachBatch,
    IvfIndexIngestForeachBatch,
    SignatureDedupIngestForeachBatch,
    UpsertForeachBatch,
    dedup_stream,
    enrich_stream,
    purchase_click_attribution,
    stateful_user_totals,
    stateful_user_totals_tws,
    read_event_stream,
    sessionized_counts,
    windowed_counts,
)

__all__ = [
    "DedupIngestForeachBatch",
    "IvfIndexIngestForeachBatch",
    "SignatureDedupIngestForeachBatch",
    "read_event_stream",
    "windowed_counts",
    "sessionized_counts",
    "dedup_stream",
    "enrich_stream",
    "purchase_click_attribution",
    "stateful_user_totals",
    "stateful_user_totals_tws",
    "UpsertForeachBatch",
]
