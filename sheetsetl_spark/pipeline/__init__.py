from sheetsetl_spark.pipeline.runner import (
    PipelineReport,
    QueryFile,
    QueryResult,
    SqlFolderPipeline,
    discover_sql_files,
)

__all__ = [
    "SqlFolderPipeline",
    "discover_sql_files",
    "QueryFile",
    "QueryResult",
    "PipelineReport",
]
