"""Round-7 batch-5 extensions, exact-similarity / uncertainty /
time-series tier: prefix-filtered exact Jaccard join (the PPJoin-family
sub-quadratic EXACT near-dup path), last-touch attribution, Wilson
lower-bound ranking, Kaplan-Meier survival, CUSUM changepoint evidence,
and one-pass histogram quantile sketching.

Registry determinism contract as usual (queries/__init__.py): floats
round 6 dp binary-wise before order-dependent accumulation, float sums
go through exact DECIMAL, thresholds/rankings compare raw doubles whose
construction is mirrored expression-for-expression in the oracle, and
every top-N carries a unique tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.text import round6_bin, round6_bin_sql
from sheetsetl_spark.queries import query

_PFJ_THRESHOLD = 0.5


@query(
    "c72_prefix_filter_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ARRAY_TO_STRING(w[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(w) - 2)) AS i) u
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           {round6_bin_sql("inter / (na.n + nb.n - inter)")} AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE inter / (na.n + nb.n - inter) >= {_PFJ_THRESHOLD}
    """,
)
def c72_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (near-dup tier): EXACT Jaccard similarity self-join via
    prefix filtering (operators/dedup.py::prefix_filter_jaccard_pairs,
    the PPJoin/AllPairs family). The oracle is deliberately NOT a mirror
    of the construction — it is the UNCAPPED brute-force shingle join —
    so the hash match certifies the prefix filter's completeness theorem
    on real data: candidates only from each doc's rarest
    |d|-ceil(t|d|)+1 shingles, yet not one qualifying pair lost."""
    from sheetsetl_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.prefix_filter_jaccard_pairs(docs, threshold=_PFJ_THRESHOLD, n=3)


@query(
    "x80_last_touch_attribution",
    oracle=f"""
    WITH marked AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT COALESCE(touch, '(none)') AS touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST({round6_bin_sql("value")} AS DECIMAL(28,6)))
                AS DOUBLE) AS attributed_value
    FROM marked WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch, '(none)')
    """,
)
def x80_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event type (the canonical marketing
    attribution query). One window pass per user (frame ends at 1
    PRECEDING so a purchase can never attribute to itself), then a
    touch-keyed aggregate; per-user event sequences are bounded, so the
    window partitions stay small at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("(none)")).alias("touch"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(round6_bin(F.col("value")).cast("decimal(28,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


_WILSON_Z2 = 3.8416  # 1.96^2, same literal in both engines
_WILSON_MIN_N = 20


@query(
    "x81_wilson_return_rate",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_trials,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returns
      FROM lineitem GROUP BY l_partkey
    ),
    scored AS (
      SELECT l_partkey, n_trials, n_returns,
             ((n_returns / CAST(n_trials AS DOUBLE))
              + {_WILSON_Z2} / (2.0 * n_trials)
              - 1.96 * SQRT(((n_returns / CAST(n_trials AS DOUBLE))
                             * (1.0 - n_returns / CAST(n_trials AS DOUBLE))
                             + {_WILSON_Z2} / (4.0 * n_trials)) / n_trials))
             / (1.0 + {_WILSON_Z2} / n_trials) AS lb
      FROM per_part WHERE n_trials >= {_WILSON_MIN_N}
    )
    SELECT l_partkey, n_trials, n_returns,
           {round6_bin_sql("lb")} AS wilson_lb
    FROM scored ORDER BY lb DESC, l_partkey LIMIT 20
    """,
)
def x81_wilson_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound ranking of per-part return rates — the
    'sort by confidence-adjusted rate' pattern (Agresti-Coull family)
    that keeps a 2/2 part from outranking a 480/520 part the way a raw
    rate sort would. All inputs are exact integer counts; the bound is
    one mirrored double expression, so the ranking is engine-identical.
    One aggregate + TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count("*").alias("n_trials"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returns"
        ),
    ).filter(F.col("n_trials") >= _WILSON_MIN_N)
    p = F.col("n_returns") / F.col("n_trials").cast("double")
    n = F.col("n_trials")
    lb = (
        p
        + F.lit(_WILSON_Z2) / (F.lit(2.0) * n)
        - F.lit(1.96)
        * F.sqrt((p * (F.lit(1.0) - p) + F.lit(_WILSON_Z2) / (F.lit(4.0) * n)) / n)
    ) / (F.lit(1.0) + F.lit(_WILSON_Z2) / n)
    return (
        per_part.withColumn("lb", lb)
        .orderBy(F.col("lb").desc(), "l_partkey")
        .limit(20)
        .select(
            "l_partkey",
            "n_trials",
            "n_returns",
            round6_bin(F.col("lb")).alias("wilson_lb"),
        )
    )


_KM_CENSOR_HOURS = 12


@query(
    "x82_kaplan_meier",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) AS first_ts,
             MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(last_ts) AS max_ts FROM per_user),
    durations AS (
      SELECT datediff('hour', first_ts, last_ts) AS dur,
             CASE WHEN last_ts >= max_ts - INTERVAL {_KM_CENSOR_HOURS} HOUR
                  THEN 0 ELSE 1 END AS observed
      FROM per_user, horizon
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM durations),
    per_dur AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt_all,
             CAST(SUM(observed) AS BIGINT) AS cnt_events
      FROM durations GROUP BY dur
    ),
    risk AS (
      SELECT dur, cnt_events,
             CAST(n_total - COALESCE(SUM(cnt_all) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
      FROM per_dur, tot
    ),
    steps AS (
      SELECT dur, at_risk, cnt_events,
             {round6_bin_sql(
                 "LN((at_risk - cnt_events) / CAST(at_risk AS DOUBLE))"
             )} AS lnf
      FROM risk WHERE cnt_events > 0 AND cnt_events < at_risk
    )
    SELECT CAST(dur AS INT) AS duration_hours, at_risk,
           cnt_events AS n_events,
           {round6_bin_sql(
               "EXP(CAST(SUM(CAST(lnf AS DECIMAL(28,6))) OVER ("
               "ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
               ") AS DOUBLE))"
           )} AS survival
    FROM steps
    """,
)
def x82_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival over user activity spans
    (duration = hour-boundary crossings between first and last event;
    censored when the last event falls within _KM_CENSOR_HOURS of the
    corpus horizon — the user may still be active). Hour granularity
    keeps the step curve non-degenerate at every test SF: the synthetic
    events corpus packs each user's last activity into the final ~3 days,
    so a day-grained horizon censored EVERYONE at sf0.01 and the driver
    hash-matched two empty frames (r7 verdict №3). The estimator's running
    product is computed as exp of a DECIMAL-accumulated sum of 6dp-
    rounded log factors, so the curve is order-independent and engine-
    bit-identical; each factor (at_risk - events)/at_risk is one double
    division over exact integers. Per-user spans are one aggregate; the
    curve itself lives on duration-grouped rows (tiny), so the ordered
    windows run over an aggregate-sized frame, not the corpus."""
    ev = load_table(spark, sf_dir, "events")
    # Lazy checkpoint: per_user feeds BOTH the horizon/total stats row
    # and the duration stream; without it column pruning specializes the
    # two subtrees past ReuseExchange's reach and the corpus is scanned
    # and user-shuffled three times (plan-tested: exactly one user_id
    # exchange survives).
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ).localCheckpoint(eager=False)
    stats = per_user.agg(
        F.max("last_ts").alias("max_ts"), F.count("*").alias("n_total")
    )
    # Hour-boundary crossings == difference of hour-truncated epochs
    # (DuckDB datediff('hour', ...) semantics, NOT elapsed-hours-floor).
    hour_diff = (
        F.unix_timestamp(F.date_trunc("hour", F.col("last_ts")))
        - F.unix_timestamp(F.date_trunc("hour", F.col("first_ts")))
    ) / 3600
    durations = per_user.crossJoin(F.broadcast(stats)).select(
        hour_diff.cast("long").alias("dur"),
        F.when(
            F.col("last_ts")
            >= F.col("max_ts") - F.expr(f"INTERVAL {_KM_CENSOR_HOURS} HOURS"),
            0,
        )
        .otherwise(1)
        .alias("observed"),
        "n_total",
    )
    per_dur = durations.groupBy("dur").agg(
        F.count("*").alias("cnt_all"),
        F.sum("observed").alias("cnt_events"),
        F.max("n_total").alias("n_total"),
    )
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_dur.select(
        "dur",
        "cnt_events",
        (
            F.col("n_total")
            - F.coalesce(F.sum("cnt_all").over(wprev), F.lit(0))
        ).alias("at_risk"),
    )
    steps = risk.filter(
        (F.col("cnt_events") > 0) & (F.col("cnt_events") < F.col("at_risk"))
    ).withColumn(
        "lnf",
        round6_bin(
            F.log(
                (F.col("at_risk") - F.col("cnt_events"))
                / F.col("at_risk").cast("double")
            )
        ),
    )
    wcum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        F.col("dur").cast("int").alias("duration_hours"),
        "at_risk",
        F.col("cnt_events").alias("n_events"),
        round6_bin(
            F.exp(
                F.sum(F.col("lnf").cast("decimal(28,6)"))
                .over(wcum)
                .cast("double")
            )
        ).alias("survival"),
    )


@query(
    "x83_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST({round6_bin_sql("value")} AS DECIMAL(28,6)))
                  AS DECIMAL(28,6)) AS total_dec
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT {round6_bin_sql(
          "CAST(SUM(total_dec) AS DOUBLE) / COUNT(*)"
      )} AS mean_daily
      FROM daily
    ),
    resid AS (
      SELECT day, CAST(total_dec AS DOUBLE) AS day_total,
             {round6_bin_sql(
                 "CAST(total_dec AS DOUBLE) - mean_daily"
             )} AS residual
      FROM daily, m
    )
    SELECT CAST(day AS VARCHAR) AS day, day_total, residual,
           CAST(SUM(CAST(residual AS DECIMAL(28,6))) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cusum
    FROM resid
    """,
)
def x83_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint evidence: the running sum of daily-total
    deviations from the corpus mean — where |cusum| peaks is the
    most-likely level-shift point (Page's cumulative-sum statistic).
    Residuals round to 6 dp and accumulate in exact DECIMAL over the
    day order, so the running path is engine-bit-identical. Everything
    after the daily aggregate runs on a days-sized frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(round6_bin(F.col("value")).cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias("total_dec")
    )
    m = daily.agg(
        round6_bin(
            F.sum("total_dec").cast("double") / F.count("*")
        ).alias("mean_daily")
    )
    resid = daily.crossJoin(F.broadcast(m)).select(
        "day",
        F.col("total_dec").cast("double").alias("day_total"),
        round6_bin(
            F.col("total_dec").cast("double") - F.col("mean_daily")
        ).alias("residual"),
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return resid.select(
        F.col("day").cast("string").alias("day"),
        "day_total",
        "residual",
        F.sum(F.col("residual").cast("decimal(28,6)"))
        .over(wcum)
        .cast("double")
        .alias("cusum"),
    )


_HIST_BINS = 100
_HIST_QS = (0.5, 0.95, 0.99)


@query(
    "x84_histogram_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - lo)
                               / ((hi - lo) / {_HIST_BINS}.0)) AS BIGINT),
                   {_HIST_BINS - 1}) AS bin
      FROM lineitem, b
    ),
    hist AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY bin),
    cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             COALESCE(SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                      PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM hist
    ),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in _HIST_QS)}]) AS q),
    hit AS (
      SELECT q, bin, cnt, cum_before,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY bin) AS rn
      FROM qs JOIN cum ON cum.cum >= q * (SELECT n FROM b)
    )
    SELECT q AS quantile,
           {round6_bin_sql(
               "lo + (bin + (q * n - cum_before) / cnt)"
               " * ((hi - lo) / " + str(_HIST_BINS) + ".0)"
           )} AS estimate
    FROM hit, b WHERE rn = 1
    """,
)
def x84_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass histogram quantile sketch: a fixed {_HIST_BINS}-bin
    equi-width histogram (single map-side-combining aggregate) with
    linear interpolation inside the hit bin — the scale path for
    quantiles where the exact form (x3) needs a full sort per group.
    At 100 TB the histogram is one scan + a 100-row frame; exact
    percentile is a corpus sort. Bin edges, targets, and interpolation
    are mirrored double expressions over exact integer counts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    b = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.count("*").alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_HIST_BINS))
    binned = li.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor((F.col("l_extendedprice") - F.col("lo")) / width),
            F.lit(_HIST_BINS - 1),
        ).alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.coalesce(F.sum("cnt").over(wprev), F.lit(0)).alias("cum_before"),
    )
    qs = None
    for q in _HIST_QS:
        row = F.lit(q).alias("q")
        frame = cum.select(row, "bin", "cnt", "cum", "cum_before")
        qs = frame if qs is None else qs.unionAll(frame)
    hit = (
        qs.crossJoin(F.broadcast(b))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q").orderBy("bin")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return hit.select(
        F.col("q").alias("quantile"),
        round6_bin(
            F.col("lo")
            + (
                F.col("bin")
                + (F.col("q") * F.col("n") - F.col("cum_before")) / F.col("cnt")
            )
            * ((F.col("hi") - F.col("lo")) / F.lit(float(_HIST_BINS)))
        ).alias("estimate"),
    )
