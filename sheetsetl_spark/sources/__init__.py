from sheetsetl_spark.sources.readers import read_csv, read_jdbc, read_json, read_parquet

__all__ = ["read_parquet", "read_csv", "read_json", "read_jdbc"]
