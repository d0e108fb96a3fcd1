"""X-series temporal joins: as-of join over the events stream.

The reference's MySQL analysts write these as correlated "latest row
before" subqueries (delegated via /root/reference/src/loader.py:231); we
provide a first-class operator (operators/asof.py) whose plan is a single
keyed sort — and check it against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.asof import asof_join
from sheetsetl_spark.queries import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@query(
    "x5_asof_join",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events),
    clicks AS (
      SELECT user_id, ts, click_id FROM (
        SELECT user_id, ts, event_id AS click_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM ev WHERE event_type = 'click') t
      WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.click_id,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           ROUND(EPOCH(p.ts - c.ts), 6) AS gap_s
    FROM purchases p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def x5_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: as-of join — each purchase matched to the user's latest click
    at-or-before it (ties on timestamp broken by max event_id, mirroring
    the oracle's pre-dedup). One shuffle on user_id, no range join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        direction="backward",
        how="inner",
        right_order=F.col("click_id"),
        right_prefix="click_",
    )
    gap = F.expr("timestampdiff(MICROSECOND, click_ts, ts)") / F.lit(1_000_000.0)
    return j.select(
        "purchase_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        "click_id",
        F.date_format("click_ts", _TS_FMT).alias("click_ts"),
        F.round(gap, 6).alias("gap_s"),
    )


@query(
    "x6_range_join",
    oracle="""
    SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber,
           STRFTIME(l.l_shipdate::TIMESTAMP, '%Y-%m-%d') AS ship_date
    FROM lineitem l
    JOIN (SELECT o_orderkey, o_orderdate FROM orders WHERE o_totalprice > 499500) o
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL '3 days'
    """,
)
def x6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: point-in-interval range join — shipments falling inside the
    3-day window after each top-price order's date. Bin-bucketed equi-join
    (operators/ranges.py), never a nested-loop over all pairs."""
    from sheetsetl_spark.operators.ranges import point_in_interval_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    iv = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 499500)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("iv_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("iv_end"),
        )
    )
    joined = point_in_interval_join(
        li, iv, point_col="l_shipdate", start_col="iv_start", end_col="iv_end",
        bin_width_s=3 * 86400,
    )
    return joined.select(
        "o_orderkey",
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@query(
    "x7_multires_rollup",
    oracle="""
    SELECT STRFTIME(TIME_BUCKET(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def x7_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: hypertable-style multi-resolution rollup — the daily aggregate
    is derived by RE-aggregating the hourly continuous aggregate, not by
    rescanning raw events (the scale pattern: aggregate once at fine
    grain, derive every coarser grain). Decimal partial sums make the
    re-aggregation exactly equal the direct daily aggregation, which is
    what the oracle computes."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("hv"),  # stays decimal
    )
    return (
        hourly.groupBy(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("hv").cast("double").alias("total_value"),
        )
    )


@query(
    "c9_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS ts,
             CASE WHEN ts::TIMESTAMP - LAG(ts::TIMESTAMP) OVER w > INTERVAL '30 minutes'
                    OR LAG(ts::TIMESTAMP) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
    ),
    sessions AS (
      SELECT user_id, event_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
)
def c9_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: explicit sessionization — gap > 30 min starts a new per-user
    session; session ids come from a running sum over boundary flags (the
    lag+cumsum idiom, one sort per user partition — the composable
    alternative to session_window when you need the ids, not just the
    aggregate)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "__eus",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag("__eus").over(w)
    # µs-precise gap comparison == the oracle's INTERVAL '30 minutes' test
    is_start = F.when(
        prev_us.isNull() | (F.col("__eus") - prev_us > 1800 * 1_000_000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = ev.select(
        "user_id",
        "event_id",
        F.sum(is_start).over(wsum).alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(F.count("*").alias("n_events"))


@query(
    "x8_time_range_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS events_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
)
def x8_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8: time-interval RANGE frame — per-user trailing-hour count and
    exact decimal sum. Spark's rangeBetween is numeric, so the frame runs
    over epoch seconds (ts truncated to µs exactly like the oracle)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # NTZ -> epoch microseconds (tz-independent), then a µs-range frame
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us.alias("__e"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("events_last_hour"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("value_last_hour"),
    )


@query(
    "x29_ohlc_bars",
    oracle="""
    WITH b AS (
      SELECT event_type,
             TIME_BUCKET(INTERVAL '6 hours', ts::TIMESTAMP) AS bucket,
             ts, event_id, value
      FROM events
    ),
    r AS (
      SELECT event_type, bucket, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type,
           STRFTIME(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS cnt
    FROM r
    GROUP BY 1, 2
    """,
)
def x29_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29: OHLC candlestick bars (6-hour buckets per event_type) — the
    time-series downsample every metrics/market pipeline runs. First/last
    are pinned by (ts, event_id) so ties are deterministic; no float
    arithmetic happens, so raw doubles pass through hash-identical.
    One shuffle: the window partition and the final agg share the
    (event_type, bucket) key."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.window("ts", "6 hours").alias("w"),
        "ts", "event_id", "value",
    ).withColumn("bucket", F.col("w.start"))
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = b.select(
        "event_type", "bucket", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
    ).agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("cnt"),
    )


@query(
    "x30_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT user_id, (ts::DATE - DATE '2024-01-01') // 7 AS w FROM events
    ),
    firsts AS (SELECT user_id, MIN(w) AS cohort_w FROM wk GROUP BY user_id),
    activity AS (
      SELECT DISTINCT wk.user_id, f.cohort_w, wk.w - f.cohort_w AS week_n
      FROM wk JOIN firsts f ON wk.user_id = f.user_id
    ),
    sizes AS (SELECT cohort_w, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort_w)
    SELECT STRFTIME(DATE '2024-01-01' + (a.cohort_w * 7) * INTERVAL '1 day', '%Y-%m-%d') AS cohort,
           a.week_n, COUNT(*) AS active_users, s.cohort_size,
           ROUND(COUNT(*) / s.cohort_size, 6) AS retention
    FROM activity a JOIN sizes s ON a.cohort_w = s.cohort_w
    GROUP BY a.cohort_w, a.week_n, s.cohort_size
    """,
)
def x30_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30: weekly retention cohorts — users grouped by first-seen week,
    activity counted per weeks-since-cohort; week buckets use an
    EXPLICIT origin (2024-01-01) because Spark's window() aligns to the
    epoch and DuckDB's TIME_BUCKET to 2000-01-03 — engine-default bucket
    origins never agree. Two aggregations over one events scan; the
    first-seen table is users-sized and broadcasts back. The classic
    product-analytics matrix, fully hash-checked."""
    ev = load_table(spark, sf_dir, "events")
    origin = F.lit("2024-01-01").cast("date")
    wk = ev.select(
        "user_id",
        F.floor(F.datediff(F.col("ts").cast("date"), origin) / 7).alias("w"),
    )
    firsts = wk.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    activity = (
        wk.join(F.broadcast(firsts), "user_id")
        .select("user_id", "cohort_w", (F.col("w") - F.col("cohort_w")).alias("week_n"))
        .distinct()
    )
    sizes = firsts.groupBy("cohort_w").agg(F.count("*").alias("cohort_size"))
    return (
        activity.join(F.broadcast(sizes), "cohort_w")
        .groupBy("cohort_w", "week_n", "cohort_size")
        .agg(F.count("*").alias("active_users"))
        .select(
            F.date_format(
                F.date_add(F.lit("2024-01-01").cast("date"), (F.col("cohort_w") * 7).cast("int")),
                "yyyy-MM-dd",
            ).alias("cohort"),
            "week_n", "active_users", "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias("retention"),
        )
    )
