"""Round-4 analytics extensions: reshaping (PIVOT/UNPIVOT), time-series
hygiene (date spine, LOCF), snapshot diffing, fuzzy matching, burst
collapse, cumulative-distinct — the everyday analyst operations a
SheetsETL user writes after the core relational surface (the reference
ships them verbatim to MySQL, /root/reference/src/loader.py:231; here
each is a Catalyst-planned DataFrame program with a DuckDB oracle twin).

Scale posture: every query keeps the big-table side shuffling at most
once on a natural key; spines / probes / bounds are one-row or tiny
aggregates that broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


@query(
    "x42_pivot_status_priority",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_low
    FROM orders GROUP BY o_orderstatus
    """,
)
def x42_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by status x priority, one wide row per status.

    The pivot value list is EXPLICIT — with it, Spark skips the extra
    distinct-values job and the aggregate is a single shuffle on the
    groupBy key with map-side partials, exactly a GROUP BY with N
    conditional counts (which is what the oracle states)."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    # absent combos: pivot-count yields null, the SQL twin counts 0
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in zip(_PRIORITIES, _PRIO_ALIASES)
        ],
    )


@query(
    "x43_unpivot_region_stats",
    oracle="""
    WITH wide AS (
      SELECT r_name,
             COUNT(DISTINCT n_nationkey) AS n_nations,
             COUNT(DISTINCT c_custkey) AS n_customers
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      GROUP BY r_name
    )
    SELECT r_name, 'n_nations' AS metric, CAST(n_nations AS BIGINT) AS value FROM wide
    UNION ALL
    SELECT r_name, 'n_customers' AS metric, CAST(n_customers AS BIGINT) AS value FROM wide
    """,
)
def x43_unpivot_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): a wide per-region stat row reshaped to long
    (region, metric, value) — the inverse of x42. Spark's native
    ``unpivot`` is a zero-shuffle projection+generate over the already-
    aggregated (tiny) wide table; the only shuffle in the whole plan is
    the upstream distinct-count aggregate."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    wide = (
        r.join(F.broadcast(n), r["r_regionkey"] == n["n_regionkey"])
        .join(c, n["n_nationkey"] == c["c_nationkey"])
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").alias("n_nations"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )
    return wide.unpivot(
        ["r_name"], ["n_nations", "n_customers"], "metric", "value"
    )


@query(
    "x44_date_spine_gapfill",
    oracle="""
    WITH b AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n FROM orders GROUP BY 1
    )
    SELECT CAST(spine.d AS VARCHAR) AS day, COALESCE(daily.n, 0) AS n_orders
    FROM spine LEFT JOIN daily USING (d)
    """,
)
def x44_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: daily order counts with missing days emitted
    as 0 — the canonical pre-step for any time-series model over sparse
    activity. The spine comes from sequence() over the one-row min/max
    aggregate (no driver round-trip, no collect); the left join's spine
    side is days-sized, so it broadcasts and the fact table still
    shuffles only once (for its own daily aggregate)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    spine = (
        o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    daily = o.groupBy("d").agg(F.count("*").alias("n"))
    return (
        F.broadcast(spine)
        .join(daily, "d", "left")
        .select(
            F.col("d").cast("string").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
    )


@query(
    "x45_locf_last_purchase",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN ROUND(value, 6) END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def x45_locf_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward): at every event, the most
    recent purchase amount for that user — forward-fill over a sparse
    signal, the standard imputation/feature shape. One window sort per
    user partition; no value ever aggregates across rows (the fill picks
    a single row's value), so doubles compare exactly and only rendering
    is rounded."""
    ev = load_table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.round("value", 6))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "x46_snapshot_diff",
    oracle="""
    WITH new_snap AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0
                  THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
    )
    SELECT status, COUNT(*) AS n FROM (
      SELECT CASE WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
                  ELSE 'same' END AS status
      FROM orders o LEFT JOIN new_snap n USING (o_orderkey)
    ) GROUP BY status
    """,
)
def x46_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (table drift check): classify every key of an old
    snapshot against a new one as removed / changed / same and count each
    class — the validation step behind any incremental-load pipeline.
    The derived "new" snapshot is deterministic (keys % 97 deleted, % 89
    price-bumped) so the oracle reconstructs it exactly. Both sides
    shuffle once on the join key; the classification is a projection."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new_snap = o.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("n_totalprice"),
    )
    status = (
        F.when(F.col("n_orderkey").isNull(), "removed")
        .when(F.col("o_totalprice") != F.col("n_totalprice"), "changed")
        .otherwise("same")
    )
    return (
        o.join(
            new_snap.withColumnRenamed("o_orderkey", "n_orderkey"),
            o["o_orderkey"] == F.col("n_orderkey"),
            "left",
        )
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


@query(
    "x47_fuzzy_match_levenshtein",
    oracle="""
    WITH probes AS (
      SELECT p_partkey AS probe_id, SUBSTRING(p_name, 2) AS probe
      FROM part ORDER BY p_partkey LIMIT 20
    )
    SELECT probe_id, probe, COUNT(*) AS n_matches,
           MIN(p_name) AS first_match
    FROM probes JOIN part ON levenshtein(probe, p_name) <= 2
    GROUP BY probe_id, probe
    """,
)
def x47_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) matching: 20 corrupted probe names (first
    character dropped) matched against the part catalog within
    Levenshtein distance 2 — the entity-resolution primitive. The probe
    side is broadcast by construction, so the 'join' is a map-side
    BroadcastNestedLoopJoin over the catalog scan: distance evaluations
    = |catalog| x 20, no shuffle of the big side at any scale. (For
    probe sets beyond broadcast size, pre-block on a cheap key — length
    band or first-char class — before the distance test.)"""
    p = load_table(spark, sf_dir, "part")
    probes = (
        p.orderBy("p_partkey")
        .limit(20)
        .select(
            F.col("p_partkey").alias("probe_id"),
            F.substring("p_name", 2, 2_000_000).alias("probe"),
        )
    )
    return (
        p.crossJoin(F.broadcast(probes))
        .filter(F.levenshtein("probe", "p_name") <= 2)
        .groupBy("probe_id", "probe")
        .agg(F.count("*").alias("n_matches"), F.min("p_name").alias("first_match"))
    )


@query(
    "x48_event_burst_collapse",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type,
             CASE WHEN ts::TIMESTAMP - LAG(ts::TIMESTAMP)
                    OVER (PARTITION BY user_id, event_type
                          ORDER BY ts::TIMESTAMP, event_id) > INTERVAL '5 minutes'
                    OR LAG(ts::TIMESTAMP)
                    OVER (PARTITION BY user_id, event_type
                          ORDER BY ts::TIMESTAMP, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_burst_start
      FROM events
    )
    SELECT event_type,
           CAST(SUM(is_burst_start) AS BIGINT) AS n_bursts,
           COUNT(*) AS n_events
    FROM marked GROUP BY event_type
    """,
)
def x48_event_burst_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst collapse: rapid-fire repeats of the same (user, event_type)
    within 5 minutes count as ONE burst — the dedup-adjacent compression
    step for clickstream features. lag+flag+sum is one window sort per
    (user, type) partition followed by a partial-aggregated rollup; the
    µs-epoch gap comparison matches the oracle's interval test exactly
    (events.ts is ns in parquet, both engines floor to µs)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "__eus",
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("__eus").over(w)
    is_start = F.when(
        prev.isNull() | (F.col("__eus") - prev > 300 * 1_000_000), 1
    ).otherwise(0)
    return (
        ev.select("event_type", is_start.alias("is_burst_start"))
        .groupBy("event_type")
        .agg(
            F.sum("is_burst_start").alias("n_bursts"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "x49_cumulative_new_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts::TIMESTAMP AS DATE)) AS d FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d)
    SELECT CAST(d AS VARCHAR) AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    """,
)
def x49_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — growth accounting without a
    running COUNT(DISTINCT) (which would need per-day state of every id
    seen). first-seen-day per user reduces the stream to one row per
    user, the daily rollup to one row per day; only THEN does the global
    ordered window run, over a days-sized input where a single partition
    is correct and trivially cheap (never a window over raw events)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d"))
    daily = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("d").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )
