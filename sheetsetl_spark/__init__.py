"""sheetsetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of stickystyle/SheetsETL.

The reference (/root/reference/src/loader.py) is a folder-of-SQL-files ETL
orchestrator that delegates every relational operation to a MySQL server
(loader.py:231) and upserts results into Google Sheets (loader.py:144-189).
This package rebuilds both capability layers Spark-first:

- the relational surface its analysts use (`spark.sql` / DataFrame programs,
  planned by Catalyst, executed by Tungsten — see ``queries/``),
- the orchestration shell (discover .sql files -> execute -> size-guard ->
  upsert sink — see ``pipeline/`` and ``sinks/``),
- plus LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing — see ``operators/``).
"""

from sheetsetl_spark.session import build_session
from sheetsetl_spark.cache import cache_scope, scoped_persist
from sheetsetl_spark.catalog import TABLES, load_table, register_views

__all__ = [
    "build_session",
    "cache_scope",
    "scoped_persist",
    "TABLES",
    "load_table",
    "register_views",
]

__version__ = "0.1.0"
