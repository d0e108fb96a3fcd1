"""B-series streaming tier, batch-checkable forms (SURVEY §2-B B50-B54).

The reference has no streaming — only cron re-runs with in-place sheet
overwrite (/root/reference/README.md:38-43; loader.py:168-174). We add the
Spark-native streaming tier; each operator below is the batch twin of a
Structured Streaming form (see sheetsetl_spark/streaming/) so the DuckDB
oracle can check it. events.ts is TIMESTAMP(NANOS) in parquet — the
catalog floors it to microseconds exactly like DuckDB does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _dsumv(alias: str):
    return F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(alias)


@query(
    "b50_tumbling_window",
    oracle="""
    SELECT STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def b50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50: tumbling event-time window (streaming form: readStream +
    withWatermark + same window())."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), _dsumv("total_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@query(
    "b51_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT TIME_BUCKET(INTERVAL '30 minutes', ts) AS ws, value FROM events
      UNION ALL
      SELECT TIME_BUCKET(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws, value
      FROM events
    )
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY ws
    """,
)
def b51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51: sliding window (1h window / 30m slide => each event lands in
    exactly two windows; the oracle materializes both assignments)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), _dsumv("total_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "cnt",
            "total_value",
        )
    )


@query(
    "b52_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS cnt
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def b52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52: session window (30-minute gap). Spark's session_window merges
    events whose time is strictly inside [start, last+gap); the oracle is
    the classic gaps-and-islands rewrite with the same >= gap boundary."""
    ev = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), fmt).alias("session_start"),
            F.date_format(F.col("w.end"), fmt).alias("session_end"),
            "cnt",
        )
    )


@query(
    "b53_watermark_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL '1 hour'
    """,
)
def b53_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B53 batch twin: late-data cutoff = max(event time) - delay. The
    streaming form is withWatermark('ts', '1 hour') (see streaming/)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, user_id, event_type
        FROM events
        WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL '1' HOUR
        """
    )


@query(
    "b54_event_dedup",
    oracle="""
    SELECT user_id, event_type, event_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def b54_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54: keyed dedup, earliest-wins (streaming form:
    dropDuplicatesWithinWatermark; batch twin is deterministic via
    row_number instead of dropDuplicates' arbitrary pick)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        )
    )
