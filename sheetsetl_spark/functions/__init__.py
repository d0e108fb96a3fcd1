from sheetsetl_spark.functions.mysql_compat import (
    date_format_mysql,
    group_concat,
    if_,
    ifnull,
    mysql_to_spark_sql,
    truncate_number,
)

__all__ = [
    "group_concat",
    "if_",
    "ifnull",
    "date_format_mysql",
    "truncate_number",
    "mysql_to_spark_sql",
]
