"""Round-4 SQL-surface extensions, batch 2: regression/statistical
aggregates, deterministic median+mode, bitwise/boolean aggregates,
FILTER-style conditional aggregation, gaps-and-islands, 2-D binned
histograms, chi-square contingency, weighted median, linear
interpolation over a date spine, autocorrelation, rolling z-score
anomalies, ratio-to-report shares, and higher-order array / map
functions.

These widen the analyst SELECT surface the reference ships verbatim to
MySQL (/root/reference/src/loader.py:231) with the statistical and
time-series idioms real report SQL contains; every query has a DuckDB
oracle twin and follows the registry determinism contract
(sheetsetl_spark/queries/__init__.py): float accumulation through exact
DECIMAL, ROUND(...,6) on emitted doubles, unique tie-break keys on any
rank or pick.

Scale posture: every query aggregates the big table at most once on a
natural key with map-side partials; derived calibration scalars (totals,
margins, cutoffs) are tiny aggregates that broadcast; windows are either
keyed (per-user, per-group) or over already-aggregated daily series
(365 rows/year — driver-scale-free); no global NTILE over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.text import round6_bin
from sheetsetl_spark.queries import query


def _dec_sum(col, alias: str, scale: str = "decimal(38,6)"):
    """Order-independent double sum: per-row double -> exact decimal -> sum."""
    return F.sum(col.cast(scale)).alias(alias)


@query(
    "x50_regression_aggregates",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS sy,
             SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS sxy,
             SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     > (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) + n * n) * 1e-9
                THEN FLOOR(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * 1000000.0 + 0.5) / 1000000.0
                END AS slope,
           CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     > (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) + n * n) * 1e-9
                THEN FLOOR(((CAST(sy AS DOUBLE)
                       - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * CAST(sx AS DOUBLE)) / n)
                     * 1000000.0 + 0.5) / 1000000.0
                END AS intercept
    FROM s
    """,
)
def x50_regression_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit (extendedprice on quantity).

    Spark ships native ``regr_slope``/``regr_intercept``, but their
    streaming double accumulation is partition-order-dependent; here the
    moments (sx, sy, sxy, sxx) accumulate in exact DECIMAL — one shuffle
    on the group key with map-side partials — and the closed-form
    slope/intercept is scalar arithmetic on the aggregated row, so the
    result is bit-stable under any partitioning. The denominator
    (n*sxx - sx^2) carries the b24/x60 relative-floor CASE guard: a
    constant-quantity group makes it pure cancellation noise, where
    engines diverge (non-ANSI Spark division-by-zero yields NULL, DuckDB
    with IEEE ops yields inf/nan); emitted doubles go through the
    portable round6_bin, not plain ROUND (ADVICE r4)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _dec_sum(q, "sx"),
        _dec_sum(p, "sy"),
        _dec_sum(q * p, "sxy"),
        _dec_sum(q * q, "sxx"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    guard = denom > (sx * sx + n * n) * 1e-9
    slope = (n * sxy - sx * sy) / denom
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.when(guard, round6_bin(slope)).alias("slope"),
        F.when(guard, round6_bin((sy - slope * sx) / n)).alias("intercept"),
    )


@query(
    "x51_median_mode",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority, ROUND(MEDIAN(o_totalprice), 6) AS median_price
      FROM orders GROUP BY o_orderpriority
    ),
    cnt AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    ),
    md AS (
      SELECT o_orderpriority, o_orderstatus AS mode_status
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                         ORDER BY c DESC, o_orderstatus) AS rn
            FROM cnt) WHERE rn = 1
    )
    SELECT o_orderpriority, median_price, mode_status
    FROM med JOIN md USING (o_orderpriority)
    """,
)
def x51_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median + deterministic mode per group.

    Median is Spark's exact ``median`` (sort-based — no float-summation
    order issues). Mode is NOT Spark's ``mode()`` (ties are
    nondeterministic): it is determinized as highest count, then lowest
    value — a keyed count plus a per-group window over group-sized
    (tiny) count rows."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price")
    )
    cnt = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("c"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("c"), F.asc("o_orderstatus"))
    md = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("mode_status"))
    )
    return med.join(md, "o_orderpriority").select(
        "o_orderpriority", "median_price", "mode_status"
    )


@query(
    "x52_bitwise_bool_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(BIT_AND(o_custkey) AS BIGINT) AS key_and,
           CAST(BIT_OR(o_custkey) AS BIGINT) AS key_or,
           CAST(BIT_XOR(o_custkey) AS BIGINT) AS key_xor,
           BOOL_AND(o_totalprice > 1000) AS all_over_1k,
           BOOL_OR(o_totalprice > 400000) AS any_over_400k
    FROM orders GROUP BY o_orderstatus
    """,
)
def x52_bitwise_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (AND/OR/XOR) and boolean (EVERY/ANY) aggregates — exact
    integer/boolean lattice operations, commutative and associative, so
    map-side partials are free and the result is partitioning-proof."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_custkey").cast("bigint").alias("key_and"),
        F.bit_or("o_custkey").cast("bigint").alias("key_or"),
        F.bit_xor("o_custkey").cast("bigint").alias("key_xor"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
    )


@query(
    "x53_conditional_agg",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) AS n_negative,
           CAST(COUNT(*) FILTER (WHERE c_acctbal >= 5000) AS BIGINT) AS n_high,
           FLOOR((CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6)))
                         FILTER (WHERE c_acctbal >= 0) AS DOUBLE)
                  / NULLIF(COUNT(*) FILTER (WHERE c_acctbal >= 0), 0))
                 * 1000000.0 + 0.5) / 1000000.0 AS avg_nonneg_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def x53_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation (MySQL spells it
    COUNT(IF(...)) / SUM(CASE...)): several differently-filtered
    aggregates computed in ONE scan and one shuffle instead of N
    self-joined subqueries — the canonical rewrite for report SQL."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    nonneg_sum = F.sum(F.when(bal >= 0, bal.cast("decimal(38,6)"))).cast("double")
    nonneg_cnt = F.count_if(bal >= 0)
    return c.groupBy("c_mktsegment").agg(
        F.count_if(bal < 0).alias("n_negative"),
        F.count_if(bal >= 5000).alias("n_high"),
        round6_bin(nonneg_sum / F.nullif(nonneg_cnt, F.lit(0))).alias("avg_nonneg_bal"),
    )


@query(
    "x55_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      FROM events
    ),
    grp AS (
      SELECT user_id, day_num,
             day_num - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_num)
               AS island
      FROM days
    ),
    islands AS (
      SELECT user_id, island, COUNT(*) AS len FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
)
def x55_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days via the
    row_number-difference trick. The window is keyed by user (bounded
    per-partition state); everything downstream re-aggregates on the same
    user key, so AQE coalesces it into one effective shuffle chain."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias("day_num")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_num")
    grp = days.withColumn("island", F.col("day_num") - F.row_number().over(w))
    islands = grp.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("active_days"),
    )


@query(
    "x56_histogram_2d",
    oracle="""
    SELECT CAST(FLOOR(l_quantity / 10) AS INT) AS qty_bin,
           CAST(ROUND(l_discount * 100) AS INT) AS disc_pct,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM lineitem GROUP BY 1, 2
    """,
)
def x56_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned heatmap (quantity-bucket x discount-percent) with
    revenue-weighted cells — the binned-scatter shape dashboards render.
    Binning is a projection, so the whole query is one partial-aggregated
    shuffle on the (small-cardinality) bin pair."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select(
            F.floor(F.col("l_quantity") / 10).cast("int").alias("qty_bin"),
            F.round(F.col("l_discount") * 100).cast("int").alias("disc_pct"),
            rev.alias("__rev"),
        )
        .groupBy("qty_bin", "disc_pct")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("__rev").cast("decimal(38,6)")).cast("double").alias("revenue"),
        )
    )


@query(
    "x57_chi_square_contingency",
    oracle="""
    WITH obs AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS observed
      FROM orders GROUP BY 1, 2
    ),
    rowm AS (SELECT o_orderstatus, SUM(observed) AS row_tot FROM obs GROUP BY 1),
    colm AS (SELECT o_orderpriority, SUM(observed) AS col_tot FROM obs GROUP BY 1),
    tot AS (SELECT SUM(observed) AS n FROM obs)
    SELECT o_orderstatus, o_orderpriority,
           CAST(observed AS BIGINT) AS observed,
           FLOOR((1.0 * row_tot * col_tot / n) * 1000000.0 + 0.5) / 1000000.0
             AS expected,
           FLOOR((POW(observed - 1.0 * row_tot * col_tot / n, 2)
                  / (1.0 * row_tot * col_tot / n)) * 1000000.0 + 0.5) / 1000000.0
             AS chi2_term
    FROM obs JOIN rowm USING (o_orderstatus)
             JOIN colm USING (o_orderpriority), tot
    """,
)
def x57_chi_square_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells (status x priority): observed vs
    expected-under-independence and the per-cell chi-square term. One
    shuffle builds the cell counts; margins are cell-table re-aggregates
    (15 rows) joined broadcast-small; the grand total enters as a
    broadcast one-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("observed"))
    rowm = obs.groupBy("o_orderstatus").agg(F.sum("observed").alias("row_tot"))
    colm = obs.groupBy("o_orderpriority").agg(F.sum("observed").alias("col_tot"))
    tot = obs.agg(F.sum("observed").alias("n"))
    expected = F.lit(1.0) * F.col("row_tot") * F.col("col_tot") / F.col("n")
    return (
        obs.join(F.broadcast(rowm), "o_orderstatus")
        .join(F.broadcast(colm), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            F.col("observed").cast("bigint").alias("observed"),
            round6_bin(expected).alias("expected"),
            round6_bin(F.pow(F.col("observed") - expected, 2) / expected).alias("chi2_term"),
        )
    )


@query(
    "x58_weighted_median",
    oracle="""
    WITH per_price AS (
      SELECT l_returnflag, l_extendedprice AS price,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT l_returnflag, price,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM per_price
    )
    SELECT l_returnflag, ROUND(MIN(price), 6) AS weighted_median_price
    FROM cum WHERE CAST(cw AS DOUBLE) >= CAST(tw AS DOUBLE) / 2
    GROUP BY l_returnflag
    """,
)
def x58_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: lowest price whose
    cumulative weight crosses half the total. Weights collapse to one row
    per distinct (group, price) FIRST — so the windowed cumulative sum
    runs over the compressed distribution, not raw line items — and
    accumulate in exact DECIMAL for partitioning-proof comparisons."""
    li = load_table(spark, sf_dir, "lineitem")
    per_price = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price")).agg(
        _dec_sum(F.col("l_quantity"), "w")
    )
    wc = Window.partitionBy("l_returnflag").orderBy("price")
    wt = Window.partitionBy("l_returnflag")
    cum = per_price.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.filter(F.col("cw").cast("double") >= F.col("tw").cast("double") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("price"), 6).alias("weighted_median_price"))
    )


@query(
    "x59_linear_interpolation",
    oracle="""
    WITH sampled AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(38,6))) AS v
      FROM events WHERE event_id % 50 = 0 GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM sampled),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    joined AS (
      SELECT s.day, CAST(v AS DOUBLE) AS v FROM spine s LEFT JOIN sampled USING (day)
    ),
    ctx AS (
      SELECT day, v,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pday,
             LAST_VALUE(v IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nday,
             FIRST_VALUE(v IGNORE NULLS)
               OVER (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM joined
    )
    SELECT day, (v IS NULL) AS interpolated,
           FLOOR((CASE WHEN v IS NOT NULL THEN v
                       ELSE pv + (nv - pv) * DATEDIFF('day', pday, day)
                                           / DATEDIFF('day', pday, nday) END)
                 * 1000000.0 + 0.5) / 1000000.0 AS value
    FROM ctx
    """,
)
def x59_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of a sparse daily series over a full date
    spine: missing days get pv + (nv-pv) * elapsed/gap from the bracketing
    observations (LOCF forward + LOCB backward with IGNORE NULLS frames).

    Scale: raw events aggregate once to daily rows; the spine and window
    run over the DAILY series (365 rows/year regardless of event volume),
    so the unkeyed window is bounded by calendar size, not data size."""
    ev = load_table(spark, sf_dir, "events")
    sampled = (
        ev.filter(F.col("event_id") % 50 == 0)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(_dec_sum(F.col("value"), "v"))
        .select("day", F.col("v").cast("double").alias("v"))
    )
    bounds = sampled.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    joined = spine.join(sampled, "day", "left")
    wb = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    vday = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "day",
        "v",
        F.last(vday, ignorenulls=True).over(wb).alias("pday"),
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.first(vday, ignorenulls=True).over(wf).alias("nday"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * F.datediff(
        "day", "pday"
    ) / F.datediff("nday", "pday")
    return ctx.select(
        "day",
        F.col("v").isNull().alias("interpolated"),
        round6_bin(F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp)).alias(
            "value"
        ),
    )


@query(
    "x60_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    lagk AS (
      SELECT k, a.rev AS y, b.rev AS x
      FROM daily a
      CROSS JOIN (VALUES (1), (7)) t(k)
      JOIN daily b ON b.day = a.day - k
    ),
    mom AS (
      SELECT k, COUNT(*) AS n,
             SUM(CAST(x AS DECIMAL(38,6))) AS sx, SUM(CAST(y AS DECIMAL(38,6))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,6))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,6))) AS syy
      FROM lagk WHERE x IS NOT NULL GROUP BY k
    )
    SELECT CAST(k AS INT) AS lag_days,
           CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     > (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) + n * n) * 1e-9
                 AND (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                     > (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) + n * n) * 1e-9
                THEN FLOOR(((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / SQRT((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                     * 1000000.0 + 0.5) / 1000000.0
                END AS autocorr
    FROM mom
    """,
)
def x60_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily revenue — Pearson r of
    the series against itself shifted k CALENDAR days (gap days produce
    no pair — true time-lag, not row-lag), from exact-DECIMAL moments
    (native ``corr`` streams doubles and is partition-order-dependent).
    The per-k partner comes from a self-join of the calendar-bounded
    daily aggregate against a 2-row broadcast lag list."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(_dec_sum(F.col("o_totalprice"), "rev"))
        .select("day", F.col("rev").cast("double").alias("rev"))
    )
    # LAG offsets must be literals, so the per-k lagged partner comes
    # from a self-join on day arithmetic (x = rev at day - k days) — the
    # daily series is calendar-bounded, so the self-join is tiny.
    ks = F.broadcast(spark.createDataFrame([(1,), (7,)], "k int"))
    lagk = (
        daily.crossJoin(ks)
        .alias("a")
        .join(
            daily.select(F.col("day").alias("pday"), F.col("rev").alias("x")).alias("b"),
            F.expr("b.pday = date_sub(a.day, a.k)"),
            "left",
        )
        .select("a.k", F.col("a.rev").alias("y"), "b.x")
    )
    pairs = lagk.filter(F.col("x").isNotNull())
    x, y = F.col("x"), F.col("y")
    mom = pairs.groupBy("k").agg(
        F.count("*").alias("n"),
        _dec_sum(x, "sx"),
        _dec_sum(y, "sy"),
        _dec_sum(x * y, "sxy"),
        _dec_sum(x * x, "sxx"),
        _dec_sum(y * y, "syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    # CASE-guarded with a RELATIVE floor (vx ~ n^2*var, mean^2 = sx^2/n^2
    # => floor is 1e-9*(sx^2 + n^2)): a near-constant series makes vx/vy
    # pure cancellation noise — tiny-negative (DuckDB SQRT errors where
    # Spark yields NaN) or tiny-positive (a garbage correlation that
    # differs across engines) — the x61 fuzz lessons applied here
    r = F.when(
        (vx > (sx * sx + n * n) * 1e-9) & (vy > (sy * sy + n * n) * 1e-9),
        round6_bin((n * sxy - sx * sy) / F.sqrt(vx * vy)),
    )
    return mom.select(
        F.col("k").cast("int").alias("lag_days"),
        n.cast("bigint").alias("n_pairs"),
        r.alias("autocorr"),
    )


@query(
    "x61_rolling_zscore",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    ),
    roll AS (
      SELECT day, rev,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s,
             CAST(SUM(CAST(rev * rev AS DECIMAL(38,12))) OVER w AS DOUBLE) AS ss
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, rev, zscore FROM (
      SELECT day, FLOOR(rev * 1000000.0 + 0.5) / 1000000.0 AS rev,
             CASE WHEN n >= 3
                   AND (ss - s * s / n) / (n - 1)
                       > ((s / n) * (s / n) + 1) * 1e-9
                  THEN FLOOR(((rev - s / n)
                              / SQRT((ss - s * s / n) / (n - 1)))
                       * 1000000.0 + 0.5) / 1000000.0 END AS zscore
      FROM roll
    ) WHERE zscore IS NOT NULL AND ABS(zscore) > 2
    """,
)
def x61_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags on daily revenue: each day scored
    against the TRAILING week (6-preceding..1-preceding — the current
    day never contaminates its own baseline), |z| > 2 flagged. Degenerate
    windows (n<3 or zero variance) are excluded, per ADVICE r3 on
    b57b's unguarded divide. The window runs over the daily aggregate,
    so state is calendar-bounded."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(_dec_sum(F.col("o_totalprice"), "rev"))
        .select("day", F.col("rev").cast("double").alias("rev"))
    )
    w = Window.orderBy("day").rowsBetween(-6, -1)
    rev = F.col("rev")
    roll = daily.select(
        "day",
        "rev",
        F.count("*").over(w).alias("n"),
        F.sum(rev.cast("decimal(38,6)")).over(w).cast("double").alias("s"),
        # 12 dp: the square of a 6-dp value has exactly 12 decimals, so
        # this quantization is (near-)lossless — at 6 dp the engines'
        # rounding modes diverge on the quantized squares (fuzz-found)
        F.sum((rev * rev).cast("decimal(38,12)")).over(w).cast("double").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (ss - s * s / n) / (n - 1)
    # CASE-guarded (not a bare WHERE): SQL engines don't short-circuit
    # conjunctions, and DuckDB's SQRT ERRORS on the tiny-negative
    # variance a constant window produces (Spark yields NaN). The floor
    # is RELATIVE (1e-9 of mean^2, +1 for near-zero means): for a
    # near-constant window, ss - s^2/n is pure cancellation noise and
    # the resulting "z-score" is numerically meaningless garbage that
    # differs across engines — both fuzz-found. Filtering on the ROUNDED
    # z keeps the |z| > 2 cut identical across engines.
    mean = s / n
    z = F.when(
        (n >= 3) & (var > (mean * mean + 1) * 1e-9),
        round6_bin((rev - mean) / F.sqrt(var)),
    )
    return (
        roll.select("day", round6_bin(rev).alias("rev"), z.alias("zscore"))
        .filter(F.col("zscore").isNotNull() & (F.abs("zscore") > 2))
    )


@query(
    "x62_ratio_to_report",
    oracle="""
    WITH nat AS (
      SELECT r_name, n_name,
             SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name,
           CAST(bal AS DOUBLE) AS balance,
           FLOOR((CAST(bal AS DOUBLE)
                  / CAST(SUM(bal) OVER (PARTITION BY r_name) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS share_of_region,
           FLOOR((CAST(bal AS DOUBLE) / CAST(SUM(bal) OVER () AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS share_of_total
    FROM nat
    """,
)
def x62_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's customer balance as a share of its
    region and of the grand total. The big table aggregates once on the
    (broadcast-joined) nation/region dims; both window totals run over
    the 25-row nation aggregate, where even the unpartitioned frame is
    trivially bounded."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nat = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dec_sum(F.col("c_acctbal"), "bal"))
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    bal = F.col("bal").cast("double")
    return nat.select(
        "r_name",
        "n_name",
        bal.alias("balance"),
        round6_bin(bal / F.sum("bal").over(wr).cast("double")).alias("share_of_region"),
        round6_bin(bal / F.sum("bal").over(wt).cast("double")).alias("share_of_total"),
    )


@query(
    "b63_higher_order_arrays",
    oracle="""
    WITH pos AS (
      SELECT vec_id, label, LEN(list_filter(embedding, x -> x > 0)) AS n_positive
      FROM embeddings
    ),
    sq AS (
      SELECT vec_id,
             FLOOR(CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                                 AS DECIMAL(28,12))) AS DOUBLE)
                   * 1000000.0 + 0.5) / 1000000.0 AS head_sum_sq
      FROM (SELECT vec_id, UNNEST(embedding[1:8]) AS v FROM embeddings) t
      GROUP BY vec_id
    )
    SELECT vec_id, label, CAST(n_positive AS INT) AS n_positive, head_sum_sq
    FROM pos JOIN sq USING (vec_id)
    """,
)
def b63_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (B-series lambda surface): FILTER to
    count positive coordinates, SLICE + TRANSFORM + AGGREGATE for the
    sum of squares of the first 8 dims — all JVM-side Catalyst lambda
    expressions in one narrow projection, zero shuffles, zero Python.
    Per-element squares cast to exact DECIMAL before the fold so the
    emitted double is fold-order-proof."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    n_pos = F.size(F.filter(vec, lambda x: x > 0)).cast("int")
    head = F.transform(
        F.slice(vec.cast("array<double>"), 1, 8),
        lambda x: (x * x).cast("decimal(28,12)"),
    )
    sum_sq = F.aggregate(
        head,
        F.lit(0).cast("decimal(28,12)"),
        # decimal + widens precision by 1; cast back so the fold type is
        # stable (8 summands of <1e2 magnitude cannot overflow 28,12)
        lambda acc, x: (acc + x).cast("decimal(28,12)"),
    ).cast("double")
    return emb.select(
        "vec_id",
        "label",
        n_pos.alias("n_positive"),
        round6_bin(sum_sq).alias("head_sum_sq"),
    )


@query(
    "b64_map_functions",
    oracle="""
    WITH cnt AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS INT) AS n_priorities,
           CAST(COALESCE(SUM(c) FILTER (WHERE o_orderpriority = '1-URGENT'), 0)
                AS BIGINT) AS urgent_orders,
           CAST(SUM(c) AS BIGINT) AS total_orders
    FROM cnt GROUP BY o_orderstatus
    """,
)
def b64_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-status priority->count maps built with
    map_from_entries over a sorted collect_list (sort_array makes the
    entry order — and thus the map — deterministic), then consumed with
    map_keys / element_at / map_values + aggregate. The oracle states the
    same values relationally — the map is the Spark-side representation
    under test, not the output schema (maps don't hash stably)."""
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("c"))
    mapped = cnt.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "c")))
        ).alias("prio_map")
    )
    m = F.col("prio_map")
    return mapped.select(
        "o_orderstatus",
        F.size(F.map_keys(m)).cast("int").alias("n_priorities"),
        F.coalesce(F.element_at(m, "1-URGENT"), F.lit(0)).cast("bigint").alias(
            "urgent_orders"
        ),
        F.aggregate(F.map_values(m), F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "total_orders"
        ),
    )


@query(
    "x63_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_state,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events
    ),
    cells AS (
      SELECT from_state, to_state, COUNT(*) AS n
      FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
           FLOOR((1.0 * n / SUM(n) OVER (PARTITION BY from_state))
                 * 1000000.0 + 0.5) / 1000000.0 AS prob
    FROM cells
    """,
)
def x63_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    LEAD pairs each event with its successor (ordered by ts with
    event_id as the unique tie-break — the determinism contract for
    ranks), then cell counts normalize to per-from-state probabilities.
    The window is keyed by user (bounded state); the probability window
    runs over the |states|^2 cell table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_state"),
        F.lead("event_type").over(w).alias("to_state"),
    )
    cells = (
        seq.filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n"))
    )
    wf = Window.partitionBy("from_state")
    return cells.select(
        "from_state",
        "to_state",
        F.col("n").cast("bigint").alias("n"),
        round6_bin(F.lit(1.0) * F.col("n") / F.sum("n").over(wf)).alias("prob"),
    )


@query(
    "x64_benford_firstdigit",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT digit, CAST(n AS BIGINT) AS n,
           FLOOR((1.0 * n / total) * 1000000.0 + 0.5) / 1000000.0 AS observed_freq,
           FLOOR(LOG10(1.0 + 1.0 / digit) * 1000000.0 + 0.5) / 1000000.0 AS benford_freq,
           FLOOR((POW(1.0 * n / total - LOG10(1.0 + 1.0 / digit), 2)
                  / LOG10(1.0 + 1.0 / digit)) * 1000000.0 + 0.5) / 1000000.0 AS chi2_term
    FROM obs, tot
    """,
)
def x64_benford_firstdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order totals: observed
    digit frequencies against log10(1 + 1/d) with a per-digit chi-square
    term — the classic synthetic-data / fraud smell test. One scan, one
    9-key aggregate; the grand total joins back as a broadcast one-row
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    freq = F.lit(1.0) * F.col("n") / F.col("total")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        round6_bin(freq).alias("observed_freq"),
        round6_bin(benford).alias("benford_freq"),
        round6_bin(F.pow(freq - benford, 2) / benford).alias("chi2_term"),
    )


@query(
    "x65_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, ROUND(revenue, 6) AS revenue,
           FLOOR(((revenue - LAG(revenue) OVER (ORDER BY month))
                  / LAG(revenue) OVER (ORDER BY month))
                 * 1000000.0 + 0.5) / 1000000.0 AS mom_growth
    FROM monthly
    """,
)
def x65_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the most common analyst report
    shape. Raw orders aggregate to the monthly grain first; LAG runs
    over the calendar-bounded monthly series (12 rows/year at any data
    volume), so the unkeyed window is scale-free. First month emits a
    null growth, as the SQL twin does."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("month")
        )
        .agg(_dec_sum(F.col("o_totalprice"), "revenue"))
        .select("month", F.col("revenue").cast("double").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        F.round("revenue", 6).alias("revenue"),
        round6_bin((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


@query(
    "x66_pareto_abc",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
             SUM(rev) OVER () AS total
      FROM per_part
    ),
    classed AS (
      SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8 THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev, total
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           FLOOR((CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS revenue_share
    FROM classed GROUP BY abc_class
    """,
)
def x66_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification: parts ranked by revenue, class A = the
    head covering 80% of cumulative revenue, B to 95%, C the tail. The
    running total uses the range-partitioned prefix-sum operator
    (operators/prefix.py) — per-partition local sums + broadcast
    partition offsets — so even though the per-part aggregate is
    dimension-sized, no single task ever materializes the whole ordered
    series (the r4 verdict's x66 nit, closed). The unique
    (rev desc, partkey) tie-break makes the decomposition exact; cum and
    total are exact decimals so the class boundaries are
    partitioning-proof."""
    from sheetsetl_spark.operators.prefix import prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(_dec_sum(rev, "rev"))
    total = per_part.agg(F.sum("rev").alias("total"))
    ranked = prefix_sum(
        per_part,
        order_by=[F.desc("rev"), F.asc("l_partkey")],
        value_col=F.col("rev"),
        out_col="cum",
        # -rev is monotone along the desc(rev) order: deterministic
        # buckets, no sampling job / checkpoint pin (prefix.py r11)
        bucket_expr=-F.col("rev"),
    ).crossJoin(F.broadcast(total))
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    classed = ranked.select(
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
        "rev",
        "total",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        round6_bin(
            F.sum("rev").cast("double") / F.max("total").cast("double")
        ).alias("revenue_share"),
    )


@query(
    "x67_running_total",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS DOUBLE) AS cum_rev
    FROM per_part
    """,
)
def x67_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running total (leaderboard cumulative revenue) via the
    range-partitioned prefix-sum operator (operators/prefix.py): range
    exchange -> per-partition local sums -> broadcast partition offsets.
    The oracle twin is the naive ``SUM(x) OVER (ORDER BY ...)`` — the
    decomposition must reproduce it EXACTLY (decimal accumulation, unique
    (rev desc, partkey) order), while the Spark plan keeps every
    data-sized stage parallel: the only single-partition window runs over
    the #partitions-row offsets table (plan-tested)."""
    from sheetsetl_spark.operators.prefix import prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(_dec_sum(rev, "rev"))
    return prefix_sum(
        per_part,
        order_by=[F.desc("rev"), F.asc("l_partkey")],
        value_col=F.col("rev"),
        out_col="cum",
        bucket_expr=-F.col("rev"),
    ).select(
        "l_partkey",
        F.col("rev").cast("double").alias("rev"),
        F.col("cum").cast("double").alias("cum_rev"),
    )
