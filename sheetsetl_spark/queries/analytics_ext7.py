"""Round-8 extensions — robust statistics and curation-pair tier:
winsorized means (x97), spend-concentration Lorenz deciles (x98),
Wald-Wolfowitz runs test over the daily revenue series (x99),
Theil-Sen robust trend slope (x100), and preference-pair construction
for DPO-style training data (c98).

Scale contracts (details per docstring):
- x97 shuffles twice on the nation key (rank + clamp-agg); thresholds
  broadcast back (nations are a dimension).
- x98's global spend rank comes from the distributed prefix sum
  (operators/prefix.py) — never a single-partition corpus window; the
  decile is exact integer arithmetic from (rank, count).
- x99/x100 run their ordered windows over AGGREGATE-sized frames
  (daily / monthly revenue — thousands of rows at any corpus size),
  the same justified single-partition-window class as x82.
- c98's per-group extrema are two keyed window ranks — shuffle on the
  (source, lang) group key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query


@query(
    "x97_winsorized_mean",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      FROM customer
    ),
    cuts AS (
      SELECT c_nationkey,
             MAX(CASE WHEN rn = (n + 19) // 20 THEN c_acctbal END) AS v_lo,
             MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN c_acctbal END) AS v_hi
      FROM ranked GROUP BY c_nationkey
    )
    SELECT r.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CAST(LEAST(GREATEST(r.c_acctbal, c.v_lo), c.v_hi)
                 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS winsor_mean,
           ROUND(CAST(SUM(CAST(r.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS raw_mean
    FROM ranked r JOIN cuts c USING (c_nationkey)
    GROUP BY r.c_nationkey
    """,
)
def x97_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per nation (clamp to the exact p5/p95 order
    statistics, then average) — the robust location estimate a curation
    pipeline uses where a plain mean is one corrupt outlier away from
    garbage. Cut ranks are exact integers (ceil(n/20) = (n+19) DIV 20,
    ceil(19n/20)) with custkey tie-break, so both engines pick the
    identical element; the clamped average goes through the decimal-sum
    recipe. Distributed shape: rank window and final aggregate both
    shuffle on the nation key; the per-nation threshold frame is
    dimension-sized and broadcasts back onto the fact."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("c_nationkey")).alias("n"),
    )
    cuts = ranked.groupBy("c_nationkey").agg(
        F.max(
            F.when(F.expr("rn = (n + 19) DIV 20"), F.col("c_acctbal"))
        ).alias("v_lo"),
        F.max(
            F.when(F.expr("rn = (19 * n + 19) DIV 20"), F.col("c_acctbal"))
        ).alias("v_hi"),
    )
    clamped = ranked.join(F.broadcast(cuts), "c_nationkey").select(
        "c_nationkey",
        "c_acctbal",
        F.least(F.greatest("c_acctbal", "v_lo"), "v_hi").alias("wv"),
    )
    return clamped.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(
            F.sum(F.col("wv").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("winsor_mean"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("raw_mean"),
    ).withColumnRenamed("c_nationkey", "nationkey")


@query(
    "x98_lorenz_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT sp,
             ROW_NUMBER() OVER (ORDER BY sp, o_custkey) AS r,
             COUNT(*) OVER () AS n
      FROM spend
    ),
    bydec AS (
      SELECT (r * 10 + n - 1) // n AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(sp) AS dec_spend
      FROM ranked GROUP BY 1
    )
    SELECT CAST(decile AS INT) AS decile, n_customers,
           CAST(dec_spend AS DOUBLE) AS decile_spend,
           ROUND(CAST(SUM(dec_spend) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(SUM(dec_spend) OVER () AS DOUBLE), 6) AS cum_share
    FROM bydec
    """,
)
def x98_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of customer spend by decile — the
    "what share of revenue do the bottom k/10 of customers carry"
    companion to the Gini scalar (x88), and the shape a data-mix
    designer reads before reweighting sources. Deciles come from the
    EXACT global spend rank via the distributed prefix sum (never a
    single-partition corpus window); decile = ceil(r*10/n) in pure
    integer arithmetic ((r*10 + n - 1) DIV n). Per-customer spend
    accumulates as DECIMAL(18,2) (exact cents), so ordering and sums
    are engine-identical; the two cumulative windows at the end run
    over the 10-row decile frame."""
    from sheetsetl_spark.operators.prefix import prefix_sum

    o = load_table(spark, sf_dir, "orders")
    # Pinned: the per-customer aggregate feeds TWO consumers (the
    # prefix-sum rank and the n_total count) — without the checkpoint
    # the orders scan + hash agg runs twice (the c99/c103 multi-consumer
    # lesson; derived frame, never a raw pruned scan).
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sp")
    ).localCheckpoint(eager=False)
    ranked = prefix_sum(
        spend,
        [F.col("sp"), F.col("o_custkey")],
        F.lit(1).cast("long"),
        out_col="r",
        bucket_expr=F.col("sp"),
    )
    n_total = spend.groupBy().agg(F.count("*").alias("n"))
    bydec = (
        ranked.crossJoin(F.broadcast(n_total))
        .groupBy(F.expr("(r * 10 + n - 1) DIV n").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("sp").alias("dec_spend"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return bydec.select(
        F.col("decile").cast("int").alias("decile"),
        "n_customers",
        F.col("dec_spend").cast("double").alias("decile_spend"),
        F.round(
            F.sum("dec_spend").over(w_cum).cast("double")
            / F.sum("dec_spend").over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


@query(
    "x99_runs_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    signs AS (
      SELECT day, SIGN(rev - LAG(rev) OVER (ORDER BY day)) AS s
      FROM daily
    ),
    seq AS (
      SELECT s, LAG(s) OVER (ORDER BY day) AS prev_s
      FROM signs WHERE s IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_deltas,
           CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
           CAST(1 + SUM(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
    FROM seq
    """,
)
def x99_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs statistic over the day-over-day revenue
    delta signs — the classic are-these-fluctuations-random check
    (too FEW runs = trending/autocorrelated, too many = oscillating),
    complementing Mann-Kendall (x96) which only sees monotone trend.
    Daily revenue is an exact DECIMAL aggregate (sign of a decimal
    difference is engine-exact, no float tie ambiguity); the sign and
    run windows operate on the daily frame — aggregate-sized at any
    corpus scale (the x82 justified-window class)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("day")
    signs = daily.select(
        "day", F.signum(F.col("rev") - F.lag("rev").over(w)).alias("s")
    ).filter(F.col("s").isNotNull())
    seq = signs.select("s", F.lag("s").over(Window.orderBy("day")).alias("prev_s"))
    return seq.agg(
        F.count("*").cast("long").alias("n_deltas"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flat"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev_s").isNotNull()
                    & (F.col("s") != F.col("prev_s")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("n_runs"),
    )


@query(
    "x100_theil_sen",
    oracle="""
    WITH monthly AS (
      SELECT DATE_TRUNC('month', o_orderdate) AS mon,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY mon) AS i FROM monthly
    ),
    slopes AS (
      SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.i - a.i) AS slope,
             a.i AS ia, b.i AS ib
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope, ia, ib) AS r,
             COUNT(*) OVER () AS m
      FROM slopes
    )
    SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
           ROUND(MAX(CASE WHEN r = (m + 1) // 2 THEN slope END), 6)
             AS ts_slope
    FROM ranked
    """,
)
def x100_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of monthly revenue: the median of
    all pairwise slopes — up to ~29% corrupted points cannot move it,
    where the OLS slope (x50) chases every outlier. Runs on the MONTHLY
    aggregate (bounded: a corpus spanning y years has ~12y months, so
    the all-pairs frame is ~(12y)^2/2 rows — thousands, not corpus-
    sized; the same aggregate-frame class as x82/x99). Slopes are one
    double division of exact DECIMAL differences by integer gaps —
    engine-identical operands — and the median picks the exact order
    statistic at rank ceil(m/2) with (ia, ib) tie-break."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    idx = monthly.select(
        "rev", F.row_number().over(Window.orderBy("mon")).alias("i")
    )
    a = idx.select(F.col("rev").alias("rev_a"), F.col("i").alias("ia"))
    b = idx.select(F.col("rev").alias("rev_b"), F.col("i").alias("ib"))
    slopes = a.join(F.broadcast(b), F.col("ib") > F.col("ia")).select(
        (
            (F.col("rev_b") - F.col("rev_a")).cast("double")
            / (F.col("ib") - F.col("ia"))
        ).alias("slope"),
        "ia",
        "ib",
    )
    ranked = slopes.select(
        "slope",
        F.row_number().over(Window.orderBy("slope", "ia", "ib")).alias("r"),
        F.count("*").over(
            Window.orderBy("slope", "ia", "ib").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    return ranked.agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.round(
            F.max(F.when(F.expr("r = (m + 1) DIV 2"), F.col("slope"))), 6
        ).alias("ts_slope"),
    )


@query(
    "c98_preference_pairs",
    oracle="""
    WITH scored AS (
      SELECT source, lang, doc_id,
             ROUND(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
                   / LEN(STRING_SPLIT(text, ' ')), 6) AS ttr
      FROM documents
    ),
    ranked AS (
      SELECT source, lang, doc_id, ttr,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY ttr DESC, doc_id) AS rb,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY ttr ASC, doc_id) AS rw
      FROM scored
    )
    SELECT b.source, b.lang,
           b.doc_id AS chosen_doc, b.ttr AS chosen_score,
           w.doc_id AS rejected_doc, w.ttr AS rejected_score
    FROM (SELECT * FROM ranked WHERE rb = 1) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w USING (source, lang)
    """,
)
def c98_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF data-prep step): per
    (source, lang) stratum, pair the best-scoring document with the
    worst-scoring one as (chosen, rejected). Score here is the
    type-token ratio (distinct words / words — the cheap lexical-
    diversity signal of c4b's quality family); in production the score
    column is whatever reward/quality model output the table carries —
    the pairing plan is the operator. Both extrema come from ONE pass:
    two row_number windows over the same (source, lang) shuffle, top
    and bottom picked with doc_id tie-break (engine-deterministic even
    with tied scores). Scale: one shuffle on the group key; the paired
    output is |strata|-sized."""
    d = load_table(spark, sf_dir, "documents")
    ttr = F.round(
        F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("double")
        / F.size(F.split(F.col("text"), " ")),
        6,
    )
    scored = d.select("source", "lang", "doc_id", ttr.alias("ttr"))
    wb = Window.partitionBy("source", "lang").orderBy(
        F.col("ttr").desc(), F.col("doc_id")
    )
    ww = Window.partitionBy("source", "lang").orderBy(
        F.col("ttr").asc(), F.col("doc_id")
    )
    ranked = scored.select(
        "source",
        "lang",
        "doc_id",
        "ttr",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    best = ranked.filter(F.col("rb") == 1).select(
        "source",
        "lang",
        F.col("doc_id").alias("chosen_doc"),
        F.col("ttr").alias("chosen_score"),
    )
    worst = ranked.filter(F.col("rw") == 1).select(
        "source",
        "lang",
        F.col("doc_id").alias("rejected_doc"),
        F.col("ttr").alias("rejected_score"),
    )
    return best.join(worst, ["source", "lang"]).select(
        "source",
        "lang",
        "chosen_doc",
        "chosen_score",
        "rejected_doc",
        "rejected_score",
    )
