"""Round-8 batch-15 — link prediction, trend forecasting, privacy:
Adamic-Adar related-item scoring over the co-purchase bipartite graph
(c99), Holt linear-trend double exponential smoothing of the daily
revenue series (c100), and t-closeness — the distribution-distance
upgrade of c81's k-anonymity/l-diversity profile (x101).

Scale contracts (details per docstring):
- c99 generates candidate pairs ONLY through a self-equi-join on the
  order key (wedges through shared groups, cost sum(|g|^2) with group
  sizes bounded by basket size) — never an all-pairs part product; the
  1/ln(|g|) weight attaches per GROUP before the pair join.
- c100's sequential recurrence folds a calendar-bounded per-key daily
  array JVM-side (the c89 ewma shape, now with a 2-element [level,
  trend] accumulator); the corpus-sized work is one map-side-combined
  daily aggregation.
- x101 is two corpus groupBys; everything after (classes x 10 buckets,
  <= 1250 rows at ANY corpus size — QI classes are dimension-bounded)
  is broadcast-joined bounded frames, and the EMD numerators are exact
  integers (c_j*N - g_j*n_c), so the only double op is the final
  division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.functions.lits import lit_double_array
from sheetsetl_spark.operators.text import round6_bin, round6_bin_sql
from sheetsetl_spark.queries import query


@query(
    "c99_adamic_adar",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
                FROM lineitem),
    deg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS gs FROM op GROUP BY g),
    w AS (
      SELECT op.g, op.item,
             FLOOR(1.0 / LN(CAST(d.gs AS DOUBLE)) * 1000000.0 + 0.5)
               / 1000000.0 AS term
      FROM op JOIN deg d ON d.g = op.g WHERE d.gs >= 2
    )
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(CAST(a.term AS DECIMAL(18,6))) AS DOUBLE) AS aa_score
    FROM w a JOIN w b ON a.g = b.g AND a.item < b.item
    GROUP BY a.item, b.item
    ORDER BY aa_score DESC, item_a, item_b
    LIMIT 100
    """,
)
def c99_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (graph/recommendation tier): Adamic-Adar link scores
    between parts through shared orders (operators/graph.py::
    adamic_adar_bipartite) — the related-item / link-prediction signal
    where sharing a SMALL basket is strong evidence and a huge basket
    is ln-damped. Top-100 pairs with (item_a, item_b) tie-break; score
    is the decimal sum of per-group 6dp terms, so partial aggregation
    over any partitioning matches DuckDB bit-for-bit."""
    from sheetsetl_spark.operators.graph import adamic_adar_bipartite

    li = load_table(spark, sf_dir, "lineitem")
    return adamic_adar_bipartite(
        li, group_col="l_orderkey", item_col="l_partkey", top=100
    )


@query(
    "c100_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM orders GROUP BY 1, 2
    ),
    seq AS MATERIALIZED (
      SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY day) AS i, x
      FROM daily),
    n AS MATERIALIZED (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_points FROM seq GROUP BY k),
    hw AS (
      SELECT k, 0 AS i, CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS t
      FROM n
      UNION ALL
      SELECT hw.k, hw.i + 1,
             0.5 * s.x + 0.5 * (hw.l + hw.t),
             0.5 * ((0.5 * s.x + 0.5 * (hw.l + hw.t)) - hw.l) + 0.5 * hw.t
      FROM hw JOIN seq s ON s.k = hw.k AND s.i = hw.i + 1
    )
    SELECT hw.k AS o_orderpriority, n.n_points,
           {round6_bin_sql("hw.l")} AS level,
           {round6_bin_sql("hw.t")} AS trend,
           {round6_bin_sql("hw.l + 7.0 * hw.t")} AS forecast_7
    FROM hw JOIN n ON n.k = hw.k AND hw.i = n.n_points
    """,
)
def c100_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (level + slope, both alpha=beta=0.5)
    of the per-priority DAILY revenue series, plus the 7-day-ahead
    linear forecast (operators/incremental.py::holt_by_key) — the trend
    monitor c89's level-only EWMA lags behind on. The 0.5 constants
    make every multiply exact in IEEE-754; the remaining additions run
    in the same defined order as the DuckDB recursive-CTE twin, which
    re-walks the identical recurrence day by day, so the chain is
    bit-identical without any libm dependence."""
    from sheetsetl_spark.operators.incremental import holt_by_key

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority"), F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("x")
    )
    return holt_by_key(
        daily, key_col="o_orderpriority", order_col="day", value_col="x"
    )


_TC_BUCKETS = 10


@query(
    "x101_t_closeness",
    oracle=f"""
    WITH b AS (SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
               FROM customer),
    binned AS (
      SELECT c_nationkey, c_mktsegment,
             LEAST(CAST(FLOOR((c_acctbal - lo)
                              / ((hi - lo) / {_TC_BUCKETS}.0)) AS BIGINT),
                   {_TC_BUCKETS - 1}) AS bucket
      FROM customer, b
    ),
    g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS gcnt
          FROM binned GROUP BY bucket),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM binned),
    cls AS (SELECT c_nationkey, c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_c
            FROM binned GROUP BY 1, 2),
    cell AS (SELECT c_nationkey, c_mktsegment, bucket,
                    CAST(COUNT(*) AS BIGINT) AS ccnt
             FROM binned GROUP BY 1, 2, 3),
    spine AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.n_c, g.bucket,
             COALESCE(cell.ccnt, 0) AS ccnt, g.gcnt, tot.n
      FROM cls CROSS JOIN tot CROSS JOIN g
      LEFT JOIN cell ON cell.c_nationkey = cls.c_nationkey
                    AND cell.c_mktsegment = cls.c_mktsegment
                    AND cell.bucket = g.bucket
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, n_c, n,
             CAST(SUM(ccnt * n - gcnt * n_c)
                  OVER (PARTITION BY c_nationkey, c_mktsegment
                        ORDER BY bucket) AS BIGINT) AS cnum
      FROM spine
    ),
    emd AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment, n_c,
             {round6_bin_sql(
                 "CAST(SUM(ABS(cnum)) AS DOUBLE)"
                 f" / (CAST(n_c AS DOUBLE) * CAST(n AS DOUBLE)"
                 f" * {_TC_BUCKETS - 1}.0)"
             )} AS t_emd
      FROM cum GROUP BY 1, 2, 3, n
    )
    SELECT nationkey, mktsegment, n_c, t_emd,
           CASE WHEN t_emd > 0.2 THEN 1 ELSE 0 END AS violates_02
    FROM emd
    """,
)
def x101_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness profile (Li, Li & Venkatasubramanian 2007): for each
    quasi-identifier equivalence class (nation, mktsegment), the Earth
    Mover's Distance between the class's account-balance distribution
    and the global one over {_TC_BUCKETS} ordered equi-width buckets —
    the release gate that catches what c81's k-anonymity misses (a
    large-enough class can still LEAK if its sensitive values skew far
    from the corpus). EMD over ordered bins = mean |cumulative
    difference|; the per-bucket numerators c_j*N - g_j*n_c are EXACT
    integers, so the only floating-point op is one final division.

    Scale: exactly TWO corpus scans — the min/max bounds pass and one
    (class, bucket) groupBy. The class/bucket/global marginals all
    derive from that bounded cell frame (<= classes x buckets rows at
    any corpus size, lazy-checkpointed so its three consumers don't
    re-run the corpus aggregate), and the 10-row global distribution
    broadcasts back."""
    cust = load_table(spark, sf_dir, "customer")
    b = cust.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_TC_BUCKETS))
    binned = cust.crossJoin(F.broadcast(b)).select(
        "c_nationkey",
        "c_mktsegment",
        F.least(
            F.floor((F.col("c_acctbal") - F.col("lo")) / width).cast("long"),
            F.lit(_TC_BUCKETS - 1).cast("long"),
        ).alias("bucket"),
    )
    cell = (
        binned.groupBy("c_nationkey", "c_mktsegment", "bucket")
        .agg(F.count("*").cast("long").alias("ccnt"))
        .localCheckpoint(eager=False)
    )
    g = cell.groupBy("bucket").agg(F.sum("ccnt").cast("long").alias("gcnt"))
    tot = cell.agg(F.sum("ccnt").cast("long").alias("n"))
    cls = cell.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("ccnt").cast("long").alias("n_c")
    )
    spine = (
        cls.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(g))
        .join(cell, ["c_nationkey", "c_mktsegment", "bucket"], "left")
        .withColumn("ccnt", F.coalesce(F.col("ccnt"), F.lit(0)))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = spine.withColumn(
        "cnum",
        F.sum(F.col("ccnt") * F.col("n") - F.col("gcnt") * F.col("n_c")).over(w),
    )
    emd = cum.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        "n_c",
        "n",
    ).agg(
        round6_bin(
            F.sum(F.abs(F.col("cnum"))).cast("double")
            / (
                F.col("n_c").cast("double")
                * F.col("n").cast("double")
                * F.lit(float(_TC_BUCKETS - 1))
            )
        ).alias("t_emd")
    )
    return emd.select(
        "nationkey",
        "mktsegment",
        "n_c",
        "t_emd",
        F.when(F.col("t_emd") > 0.2, F.lit(1)).otherwise(F.lit(0)).alias(
            "violates_02"
        ),
    )


_KEY_A_SOURCES = "('src0', 'src1', 'src2', 'src3', 'src4')"


@query(
    "c101_term_keyness",
    oracle=f"""
    WITH toks AS (
      SELECT CASE WHEN source IN {_KEY_A_SOURCES} THEN 1 ELSE 0 END AS in_a,
             UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ),
    cells AS (SELECT term, CAST(SUM(in_a) AS BIGINT) AS a,
                     CAST(SUM(1 - in_a) AS BIGINT) AS b
              FROM toks GROUP BY term),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
                   CAST(SUM(b) AS BIGINT) AS nb FROM cells),
    t AS (SELECT * FROM cells, tot WHERE a + b >= 5)
    SELECT term, a AS cnt_a, b AS cnt_b,
      CASE WHEN CAST(a AS DOUBLE) * nb > CAST(b AS DOUBLE) * na
           THEN 1 ELSE -1 END AS direction,
      {round6_bin_sql(
          "2.0 * ("
          "CASE WHEN a > 0 THEN a * ("
          + round6_bin_sql(
              "LN(a / (CAST(na AS DOUBLE) * (a + b) / (na + nb)))"
          )
          + ") ELSE 0.0 END"
          " + CASE WHEN b > 0 THEN b * ("
          + round6_bin_sql(
              "LN(b / (CAST(nb AS DOUBLE) * (a + b) / (na + nb)))"
          )
          + ") ELSE 0.0 END)"
      )} AS g2
    FROM t ORDER BY g2 DESC, term LIMIT 50
    """,
)
def c101_term_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-series (corpus-comparison tier): Dunning G2 term keyness of
    sources src0-src4 vs the rest (operators/text.py::term_keyness) —
    x95's PSI says THAT the mix moved; keyness names WHICH terms moved
    it, signed by direction. One explode + two hash aggregates; slice
    totals broadcast back as a one-row frame; each ln factor 6dp-rounded
    before its integer-weighted combination (the x82/c70 recipe)."""
    from sheetsetl_spark.operators.text import term_keyness

    docs = load_table(spark, sf_dir, "documents")
    return term_keyness(
        docs,
        in_a=F.col("source").isin("src0", "src1", "src2", "src3", "src4"),
        min_count=5,
        top=50,
    )


def _kcenter_oracle(k: int = 8) -> str:
    """Chained-CTE DuckDB twin of the greedy k-center traversal: every
    round re-derives argmax(min dist^2 to the selected set) with the
    same defined left-fold distances and (value DESC, vec_id) tie-break.
    Each round's distance frame is MATERIALIZED — un-hinted, DuckDB
    re-inlines the previous round's frame into both of its two
    consumers and the plan doubles per round (the k-core lesson)."""

    def fold(expr: str) -> str:
        return (
            "LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, "
            f"LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t.v)), i -> {expr})), "
            "(acc, x) -> acc + x)"
        )

    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "n AS (SELECT vec_id, v, LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, "
        "LIST_TRANSFORM(v, x -> x * x)), (acc, x) -> acc + x) AS crit FROM e)",
        "s1 AS (SELECT vec_id, v AS cv FROM n ORDER BY crit DESC, vec_id "
        "LIMIT 1)",
        "d1 AS MATERIALIZED (SELECT t.vec_id, t.v, "
        + fold("(t.v[i] - cv[i]) * (t.v[i] - cv[i])")
        + " AS mind2 FROM e t CROSS JOIN s1)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"s{r} AS (SELECT vec_id, v AS cv, mind2 FROM d{r - 1} "
            f"ORDER BY mind2 DESC, vec_id LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"d{r} AS MATERIALIZED (SELECT t.vec_id, t.v, "
                f"LEAST(t.mind2, "
                + fold("(t.v[i] - cv[i]) * (t.v[i] - cv[i])")
                + f") AS mind2 FROM d{r - 1} t CROSS JOIN s{r})"
            )
    from sheetsetl_spark.operators.text import round6_bin_sql as r6

    selects = [
        "SELECT 1 AS sel_rank, vec_id, 0.0 AS d2_at_selection FROM s1"
    ] + [
        f"SELECT {r}, vec_id, {r6('mind2')} FROM s{r}" for r in range(2, k + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@query("c102_kcenter_coreset", oracle=_kcenter_oracle())
def c102_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (farthest-point traversal, Gonzalez's
    2-approximation) over the embeddings table — the diversity-
    maximizing seed-set selection a training pipeline runs before
    sampling or labeling (operators/similarity.py::kcenter_coreset).
    Each of the 8 rounds is one shuffle-free corpus scan against
    broadcast literal centers plus a 1-row argmax collect (bounded
    driver state, the BPE-argmax precedent); distances are the defined
    left-fold, bit-identical to the oracle's LIST_REDUCE."""
    from sheetsetl_spark.operators.similarity import kcenter_coreset

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, k=8)


_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority"),
]


@query(
    "x102_column_profile",
    oracle=f"""
    SELECT * FROM (
    {" UNION ALL ".join(
        f'''SELECT '{name}' AS column_name,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(*) - COUNT({name}) AS BIGINT) AS n_null,
              CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct,
              MIN({expr}) AS min_str, MAX({expr}) AS max_str
            FROM orders'''
        for name, expr in _PROFILE_COLS
    )})
    """,
)
def x102_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile: one row per column of `orders` with
    row/null/exact-distinct counts and min/max (rendered through
    engine-portable string forms: decimals and dates, never raw double
    formatting). The data-engineer's first query against an unknown
    100 TB table, and the statistics a curation pipeline snapshots per
    ingest to diff against the previous drop.

    Scale shape: ONE corpus scan — Spark plans the multi-column
    COUNT(DISTINCT ...) aggregate through a single Expand (one pass,
    |cols|+1 row replication, map-side partials), never one scan per
    column; min/max/null ride the same aggregate. The result is a
    |cols|-row frame assembled from per-column scalar structs.
    """
    orders = load_table(spark, sf_dir, "orders")
    date_str = F.col("o_orderdate").cast("date").cast("string")
    price_str = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    exprs = {
        "o_orderkey": F.col("o_orderkey").cast("string"),
        "o_custkey": F.col("o_custkey").cast("string"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice": price_str,
        "o_orderdate": date_str,
        "o_orderpriority": F.col("o_orderpriority"),
    }
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for name in exprs:
        aggs += [
            (F.count("*") - F.count(name)).cast("long").alias(f"{name}__nn"),
            F.countDistinct(name).cast("long").alias(f"{name}__nd"),
            F.min(exprs[name]).alias(f"{name}__mn"),
            F.max(exprs[name]).alias(f"{name}__mx"),
        ]
    wide = orders.agg(*aggs)
    struct_rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{name}__nn").alias("n_null"),
                F.col(f"{name}__nd").alias("n_distinct"),
                F.col(f"{name}__mn").alias("min_str"),
                F.col(f"{name}__mx").alias("max_str"),
            )
            for name in exprs
        ]
    )
    return wide.select(F.explode(struct_rows).alias("p")).select("p.*")


@query(
    "c103_conformal_coverage",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             ('0x' || SUBSTRING(MD5('cal:' || CAST(o_orderkey AS VARCHAR)),
                                1, 8))::BIGINT < 2147483648 AS is_cal
      FROM orders
    ),
    pred AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_cal,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS yhat
      FROM base WHERE is_cal GROUP BY 1
    ),
    cal_resid AS (
      SELECT b.o_orderpriority, ABS(b.o_totalprice - p.yhat) AS r,
             b.o_orderkey, p.n_cal
      FROM base b JOIN pred p USING (o_orderpriority) WHERE b.is_cal
    ),
    qhat AS (
      SELECT o_orderpriority, r AS q FROM (
        SELECT o_orderpriority, r, n_cal,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY r, o_orderkey) AS rk
        FROM cal_resid
      ) WHERE rk = LEAST((9 * n_cal + 18) // 10, n_cal)
    )
    SELECT b.o_orderpriority, p.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           {round6_bin_sql("q.q")} AS q_hat,
           {round6_bin_sql(
               "CAST(SUM(CASE WHEN ABS(b.o_totalprice - p.yhat) <= q.q"
               " THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)"
           )} AS coverage
    FROM base b JOIN pred p USING (o_orderpriority)
                JOIN qhat q USING (o_orderpriority)
    WHERE NOT b.is_cal
    GROUP BY 1, 2, q.q
    """,
)
def c103_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with measured coverage
    (Vovk et al. / the distribution-free eval a model gate runs): a
    deterministic md5 split carves calibration/test halves; the
    per-priority calibration-mean 'model' yields absolute residuals;
    q_hat is the EXACT ceil((n+1)*0.9)-th order statistic of the
    calibration residuals (integer rank arithmetic, orderkey
    tie-break); coverage = share of held-out residuals <= q_hat
    (guaranteed >= 0.9 in expectation — asserted as a unit test).

    Scale shape: one corpus scan for the split + two keyed aggregates;
    the rank runs in a priority-KEYED window (never single-partition);
    the 5-row pred/q_hat frames broadcast back onto the test scan."""
    orders = load_table(spark, sf_dir, "orders")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cal:"), F.col("o_orderkey").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    # base feeds the calibration aggregate, the residual rank AND the
    # test-side coverage scan — un-pinned, Spark re-ran the corpus scan
    # + md5 split up to 7x (ReusedExchange caught 1). The pinned frame
    # is the 4 pruned columns, so the one-time materialization replaces
    # six re-scans.
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        (u < F.lit(2147483648)).alias("is_cal"),
    ).localCheckpoint(eager=False)
    cal = base.filter(F.col("is_cal"))
    pred = cal.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_cal"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("yhat"),
    )
    cal_resid = cal.join(F.broadcast(pred), "o_orderpriority").select(
        "o_orderpriority",
        "n_cal",
        "o_orderkey",
        F.abs(F.col("o_totalprice") - F.col("yhat")).alias("r"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("r", "o_orderkey")
    # Integer rank arithmetic end-to-end: DIV stays exact for any bigint
    # n_cal, whereas (9*n_cal+18)/10 in double drifts past 2^53 — the
    # same hazard the c105 comment documents.
    k = F.least(
        F.expr("(9 * n_cal + 18) DIV 10"), F.col("n_cal")
    )
    qhat = (
        cal_resid.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == k.cast("long"))
        .select("o_orderpriority", F.col("r").alias("q"))
    )
    test = base.filter(~F.col("is_cal"))
    return (
        test.join(F.broadcast(pred), "o_orderpriority")
        .join(F.broadcast(qhat), "o_orderpriority")
        .groupBy("o_orderpriority", "n_cal", "q")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            round6_bin(
                F.sum(
                    F.when(
                        F.abs(F.col("o_totalprice") - F.col("yhat"))
                        <= F.col("q"),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("coverage"),
        )
        .select(
            "o_orderpriority",
            "n_cal",
            "n_test",
            round6_bin(F.col("q")).alias("q_hat"),
            "coverage",
        )
    )


_JL_K, _JL_DIM, _JL_SAMPLE = 16, 64, 50


def _jl_oracle() -> str:
    """DuckDB twin of the JL projection eval: the SAME seeded +/-1 plane
    literals inline (the LSH-oracle idiom), LIST_DOT_PRODUCT for the
    projections (bit-identical to the Spark left-fold), LIST_REDUCE
    left-folds for both squared distances."""
    from sheetsetl_spark.operators.similarity import hyperplanes

    planes = hyperplanes(_JL_K, _JL_DIM, tag="jl")
    proj = ", ".join(
        "LIST_DOT_PRODUCT(["
        + ", ".join(repr(v) for v in row)
        + "]::DOUBLE[], v) / 4.0"
        for row in planes
    )
    def foldd(a: str, b: str, n: int) -> str:
        return (
            "LIST_REDUCE(LIST_PREPEND(0.0::DOUBLE, "
            f"LIST_TRANSFORM(GENERATE_SERIES(1, {n}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
            "(acc, x) -> acc + x)"
        )

    from sheetsetl_spark.operators.text import round6_bin_sql as r6

    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < {_JL_SAMPLE}
    ),
    p AS (SELECT vec_id, v, [{proj}] AS y FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {r6(foldd('a.v', 'b.v', _JL_DIM))} AS d2_orig,
           {r6(foldd('a.y', 'b.y', _JL_K))} AS d2_proj,
           {r6(foldd('a.y', 'b.y', _JL_K) + " / " + foldd('a.v', 'b.v', _JL_DIM))} AS ratio
    FROM p a JOIN p b ON a.vec_id < b.vec_id
    """


@query("c104_jl_projection", oracle=_jl_oracle())
def c104_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (64 -> 16 dims via the
    seeded +/-1 planes, scaled 1/sqrt(k)) with MEASURED pairwise
    distance distortion on a bounded sample — the cheap-ANN scale path:
    project once map-side, run downstream similarity in 1/4 the bytes,
    and this query is the evidence of what that costs (ratio
    distribution of projected vs original squared distances; JL says
    concentration around 1). The projection is one corpus-linear
    map-side pass at any scale; the distortion EVAL joins only the
    bounded sample with itself (the c35/c91 honest-ANN practice:
    the approximation ships with its measured error)."""
    from sheetsetl_spark.operators.similarity import _sqdist, hyperplanes

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < _JL_SAMPLE).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planes = hyperplanes(_JL_K, _JL_DIM, tag="jl")
    projs = [
        (
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    lit_double_array(row),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(4.0)
        )
        for row in planes
    ]
    p = base.withColumn("y", F.array(*projs)).localCheckpoint(eager=False)

    def fold_d2(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = p.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("y").alias("ya")
    )
    b = p.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("y").alias("yb")
    )
    d2o = fold_d2("va", "vb")
    d2p = fold_d2("ya", "yb")
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round6_bin(d2o).alias("d2_orig"),
            round6_bin(d2p).alias("d2_proj"),
            round6_bin(d2p / d2o).alias("ratio"),
        )
    )


_NEY_BUDGET = 1000


@query(
    "c105_neyman_allocation",
    oracle=f"""
    WITH mom AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                      * CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS sxx
      FROM orders GROUP BY 1
    ),
    sdev AS (
      SELECT o_orderpriority, n_pop,
             CASE WHEN n_pop <= 1 THEN 0.0
                  WHEN (sxx - sx * sx / n_pop) / (n_pop - 1)
                       <= ((sx / n_pop) * (sx / n_pop) + 1) * 1e-9 THEN 0.0
                  ELSE FLOOR(SQRT((sxx - sx * sx / n_pop) / (n_pop - 1))
                             * 10000.0 + 0.5) / 10000.0
             END AS s_h
      FROM mom
    ),
    w AS (
      SELECT o_orderpriority, n_pop, s_h,
             CAST(FLOOR(n_pop * s_h + 0.5) AS BIGINT) AS wu
      FROM sdev
    ),
    t AS (SELECT CAST(SUM(wu) AS BIGINT) AS tw, CAST(SUM(n_pop) AS BIGINT)
                 AS tn FROM w),
    eff AS (
      SELECT w.*, CASE WHEN t.tw = 0 THEN w.n_pop ELSE w.wu END AS ew,
             CASE WHEN t.tw = 0 THEN t.tn ELSE t.tw END AS et
      FROM w CROSS JOIN t
    ),
    alloc AS (
      SELECT o_orderpriority, n_pop, s_h,
             ({_NEY_BUDGET} * ew) // et AS base,
             ({_NEY_BUDGET} * ew) % et AS rem,
             ROW_NUMBER() OVER (ORDER BY ({_NEY_BUDGET} * ew) % et DESC,
                                o_orderpriority) AS rrk,
             {_NEY_BUDGET} - CAST(SUM(({_NEY_BUDGET} * ew) // et)
                                  OVER () AS BIGINT) AS leftover
      FROM eff
    ),
    final AS (
      SELECT o_orderpriority, n_pop, s_h,
             CAST(base + CASE WHEN rrk <= leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS n_alloc
      FROM alloc
    ),
    ranked AS (
      SELECT o.o_orderpriority, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o.o_orderpriority
                                ORDER BY MD5('ney:' || CAST(o.o_orderkey
                                             AS VARCHAR)), o.o_orderkey)
               AS rk
      FROM orders o
    )
    SELECT f.o_orderpriority, f.n_pop, f.s_h, f.n_alloc,
           CAST(COUNT(r.o_totalprice) AS BIGINT) AS n_sampled,
           ROUND(CAST(SUM(CAST(r.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(r.o_totalprice), 6) AS sample_mean
    FROM final f LEFT JOIN ranked r
      ON r.o_orderpriority = f.o_orderpriority AND r.rk <= f.n_alloc
    GROUP BY 1, 2, 3, 4
    """,
)
def c105_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling (the survey-statistics
    optimum: per-stratum sample size n_h proportional to N_h * S_h, so
    high-variance strata get more of the budget than c7's proportional
    rule gives them): exact decimal-moment stddevs (the b24 recipe),
    allocation by INTEGER largest-remainder arithmetic over 6dp-scaled
    weight units (floor division + modular remainder ranking — no
    engine-order-sensitive double sums anywhere in the allocation), an
    all-constant-strata fallback to population weights, and the sample
    itself drawn per stratum as the n_h smallest md5(tag:orderkey)
    uniforms (reproducible on any cluster or partitioning).

    Scale shape: one corpus scan for the moments, one priority-keyed
    rank window for the draw; the 5-row allocation math broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    # asymmetric casts, both exact: Spark multiplies (18,4) factors
    # ((37,8) product, inside the 38-digit cap) while the ORACLE casts
    # to DECIMAL(19,4) because DuckDB stores <=18-digit decimals in
    # int64 and its multiply overflows on totalprice^2 (~1.4e19);
    # 19 digits force the int128 path. Same exact value either way.
    price4 = F.col("o_totalprice").cast("decimal(18,4)")
    mom = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_pop"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sx"),
        F.sum(price4 * price4).cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n_pop"), F.col("sx"), F.col("sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    s_h = (
        F.when(n <= 1, F.lit(0.0))
        .when(var <= ((sx / n) * (sx / n) + 1) * 1e-9, F.lit(0.0))
        .otherwise(F.floor(F.sqrt(var) * 10000.0 + 0.5) / 10000.0)
    )
    w = mom.select(
        "o_orderpriority",
        "n_pop",
        s_h.alias("s_h"),
        F.floor(n * s_h + 0.5).cast("long").alias("wu"),
    )
    t = w.agg(
        F.sum("wu").cast("long").alias("tw"),
        F.sum("n_pop").cast("long").alias("tn"),
    )
    eff = w.crossJoin(F.broadcast(t)).select(
        "o_orderpriority",
        "n_pop",
        "s_h",
        F.when(F.col("tw") == 0, F.col("n_pop")).otherwise(F.col("wu")).alias("ew"),
        F.when(F.col("tw") == 0, F.col("tn")).otherwise(F.col("tw")).alias("et"),
    )
    budget = F.lit(_NEY_BUDGET)
    # DIV/% keep the allocation in exact int64 arithmetic — a double
    # division here can floor across an integer boundary differently
    # from DuckDB's // once the products leave double's 2^53 range
    alloc = eff.selectExpr(
        "o_orderpriority",
        "n_pop",
        "s_h",
        f"CAST(({_NEY_BUDGET} * ew) DIV et AS BIGINT) AS base",
        f"CAST(({_NEY_BUDGET} * ew) % et AS BIGINT) AS rem",
    )
    wrk = Window.orderBy(F.col("rem").desc(), "o_orderpriority")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    final = alloc.select(
        "o_orderpriority",
        "n_pop",
        "s_h",
        (
            F.col("base")
            + F.when(
                F.row_number().over(wrk)
                <= budget - F.sum("base").over(wall),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_alloc"),
    )
    rk = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy(
            F.md5(
                F.concat(F.lit("ney:"), F.col("o_orderkey").cast("string"))
            ),
            "o_orderkey",
        )
    )
    ranked = orders.select(
        "o_orderpriority", "o_totalprice", rk.alias("rk")
    )
    return (
        final.join(
            ranked,
            (ranked["o_orderpriority"] == final["o_orderpriority"])
            & (F.col("rk") <= F.col("n_alloc")),
            "left",
        )
        .drop(ranked["o_orderpriority"])
        .groupBy("o_orderpriority", "n_pop", "s_h", "n_alloc")
        .agg(
            F.count("o_totalprice").cast("long").alias("n_sampled"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count("o_totalprice"),
                6,
            ).alias("sample_mean"),
        )
    )
