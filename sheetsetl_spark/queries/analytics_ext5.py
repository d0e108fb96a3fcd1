"""Round-7 batch-8 extensions, linkage / rules / ML-evaluation tier:
Fellegi-Sunter blocked record linkage, association rules with
confidence + lift, the Theil T inequality index, score calibration
(reliability) bins, and centroid-based silhouette scoring of an
embedding space.

Scale contracts:
- Record linkage generates candidates ONLY inside blocking keys (an
  equi-join, never a cross of the corpus) — the Fellegi-Sunter
  agreement scoring is a per-pair expression, so cost is candidate-
  proportional exactly like the near-dup tier (operators/dedup.py).
- Association rules reuse the basket->distinct-item->pair equi-join
  shape of c60 and add only aggregate-frame joins (item supports are
  a map-side-combined count, broadcast back onto pairs).
- Theil and calibration are single corpus passes + one-row broadcast
  bounds (the x84 pattern).
- Silhouette flattens vectors once (posexplode), broadcasts the tiny
  (label x dim) centroid frame onto the flattened stream, and reduces
  (vector, candidate-label) partial distances by hash aggregation —
  dims never co-locate, no driver collect.

Registry determinism contract as usual (queries/__init__.py): per-term
round6 binning + exact-DECIMAL accumulation wherever doubles cross
rows; money binned to integer cents; every threshold compares a value
whose construction is mirrored expression-for-expression in the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.text import round6_bin, round6_bin_sql
from sheetsetl_spark.queries import query

# Fellegi-Sunter agreement/disagreement weights (log2 m/u odds). Fixed
# literals standing in for the EM-estimated m- and u-probabilities of a
# production linkage run; both engines read the same constants.
_FS_W_SEG_AGREE = 2.2
_FS_W_SEG_DISAGREE = -1.1
_FS_W_BAL_AGREE = 1.5
_FS_W_BAL_DISAGREE = -0.7
_FS_THRESHOLD = 2.0

_AR_MIN_SUPPORT = 3

_CAL_BINS = 10


@query(
    "c78_record_linkage",
    oracle=f"""
    WITH a AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS bal_block,
             FLOOR(c_acctbal * 100.0 + 0.5) AS bal_cents
      FROM customer WHERE c_custkey % 2 = 0
    ),
    b AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS bal_block,
             FLOOR(c_acctbal * 100.0 + 0.5) AS bal_cents
      FROM customer WHERE c_custkey % 2 = 1
    ),
    scored AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             (CASE WHEN a.c_mktsegment = b.c_mktsegment
                   THEN {_FS_W_SEG_AGREE} ELSE {_FS_W_SEG_DISAGREE} END
              + CASE WHEN ABS(a.bal_cents - b.bal_cents) <= 1000
                     THEN {_FS_W_BAL_AGREE} ELSE {_FS_W_BAL_DISAGREE} END)
               AS score
      FROM a JOIN b
        ON a.c_nationkey = b.c_nationkey AND a.bal_block = b.bal_block
    )
    SELECT id_a, id_b, {round6_bin_sql("score")} AS score
    FROM scored WHERE score >= {_FS_THRESHOLD}
    """,
)
def c78_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter blocked record linkage: customers split into two
    synthetic sources (even/odd custkey), candidates generated ONLY
    within (nationkey, acctbal-hundred) blocks, each pair scored by
    fixed agreement/disagreement log-odds on market segment and
    balance-within-10. Pairs above the decision threshold survive.

    The blocking equi-join is the whole scale story: candidate count is
    sum over blocks of |A_block|*|B_block|, never |A|*|B| — the same
    candidate-proportional contract as the LSH band joins. Balance
    cents bin with the FLOOR(x*100+0.5) form so the within-10 predicate
    compares exact integers on both engines."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100.0).cast("long").alias("bal_block"),
        F.floor(F.col("c_acctbal") * 100.0 + 0.5).alias("bal_cents"),
    )
    a = cust.filter(F.col("c_custkey") % 2 == 0)
    b = cust.filter(F.col("c_custkey") % 2 == 1)
    pairs = a.alias("a").join(
        b.alias("b"),
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.bal_block") == F.col("b.bal_block")),
    )
    score = F.when(
        F.col("a.c_mktsegment") == F.col("b.c_mktsegment"),
        F.lit(_FS_W_SEG_AGREE),
    ).otherwise(F.lit(_FS_W_SEG_DISAGREE)) + F.when(
        F.abs(F.col("a.bal_cents") - F.col("b.bal_cents")) <= 1000,
        F.lit(_FS_W_BAL_AGREE),
    ).otherwise(F.lit(_FS_W_BAL_DISAGREE))
    return (
        pairs.select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            score.alias("raw_score"),
        )
        .filter(F.col("raw_score") >= _FS_THRESHOLD)
        .select("id_a", "id_b", round6_bin(F.col("raw_score")).alias("score"))
    )


@query(
    "c79_assoc_rules",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ),
    supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM items
             GROUP BY item),
    n AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n FROM items),
    pairs AS (
      SELECT a.item AS ante, b.item AS cons,
             CAST(COUNT(*) AS BIGINT) AS sp
      FROM items a JOIN items b ON a.g = b.g AND a.item <> b.item
      GROUP BY a.item, b.item
    )
    SELECT ante, cons, sp AS pair_support,
           {round6_bin_sql(
               "CAST(sp AS DOUBLE) / CAST(sa.s AS DOUBLE)"
           )} AS confidence,
           {round6_bin_sql(
               "(CAST(sp AS DOUBLE) * CAST((SELECT n FROM n) AS DOUBLE))"
               " / (CAST(sa.s AS DOUBLE) * CAST(sc.s AS DOUBLE))"
           )} AS lift
    FROM pairs
    JOIN supp sa ON sa.item = ante
    JOIN supp sc ON sc.item = cons
    WHERE sp >= {_AR_MIN_SUPPORT}
    """,
)
def c79_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: directed rules ante->cons
    with pair support >= {_AR_MIN_SUPPORT}, confidence sp/s(ante) and
    lift sp*n/(s(ante)*s(cons)) — the c60 co-purchase pair mining
    extended to the full a-priori rule statistics a recommender or
    mix-curation pass consumes.

    Basket->distinct-item dedup, pair equi-join on the basket key, one
    map-side-combined pair count; item supports are an aggregate-frame
    count joined back onto the (already aggregate-sized) rule frame,
    and n is a broadcast scalar. All ratios form from exact integers in
    identical double expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    # one corpus scan: the distinct item stream feeds both pair-join
    # sides, the support count, and n — lazily checkpointed so the
    # basket dedup shuffle runs once.
    items = (
        li.select(
            F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("item")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    supp = items.groupBy("item").agg(F.count("*").alias("s"))
    n_row = items.agg(F.countDistinct("g").alias("n"))
    pairs = (
        items.alias("a")
        .join(items.alias("b"), "g")
        .filter(F.col("a.item") != F.col("b.item"))
        .groupBy(F.col("a.item").alias("ante"), F.col("b.item").alias("cons"))
        .agg(F.count("*").alias("sp"))
        .filter(F.col("sp") >= _AR_MIN_SUPPORT)
    )
    return (
        pairs.join(supp.select(F.col("item").alias("ante"), F.col("s").alias("sa")), "ante")
        .join(supp.select(F.col("item").alias("cons"), F.col("s").alias("sc")), "cons")
        .crossJoin(F.broadcast(n_row))
        .select(
            "ante",
            "cons",
            F.col("sp").alias("pair_support"),
            round6_bin(
                F.col("sp").cast("double") / F.col("sa").cast("double")
            ).alias("confidence"),
            round6_bin(
                (F.col("sp").cast("double") * F.col("n").cast("double"))
                / (F.col("sa").cast("double") * F.col("sc").cast("double"))
            ).alias("lift"),
        )
    )


@query(
    "x89_theil_index",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx
      FROM spend
    )
    SELECT n,
           {round6_bin_sql(
               "CAST(SUM(CAST((" + round6_bin_sql(
                   "(CAST(cents AS DOUBLE) * CAST(n AS DOUBLE)"
                   " / CAST(sx AS DOUBLE))"
                   " * LN(CAST(cents AS DOUBLE) * CAST(n AS DOUBLE)"
                   "      / CAST(sx AS DOUBLE))"
               ) + ") AS DECIMAL(28,6))) AS DOUBLE)"
               " / CAST(n AS DOUBLE)"
           )} AS theil_t
    FROM spend, s GROUP BY n
    """,
)
def x89_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of per-customer order spend:
    T = (1/n) * sum((x_i/mu) * ln(x_i/mu)) — the decomposable
    complement to x88's Gini that needs NO global ordering at all: one
    map-side-combined per-customer aggregate, a broadcast (n, sum) row,
    and a second reduce. Terms round 6 dp and accumulate in exact
    DECIMAL (the c73 recipe); money bins to integer cents first."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )
    s = spend.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sx"),
    )
    ratio = (
        F.col("cents").cast("double")
        * F.col("n").cast("double")
        / F.col("sx").cast("double")
    )
    term = round6_bin(ratio * F.log(ratio))
    return (
        spend.crossJoin(F.broadcast(s))
        .groupBy("n")
        .agg(
            round6_bin(
                F.sum(term.cast("decimal(28,6)")).cast("double")
                / F.col("n").cast("double")
            ).alias("theil_t")
        )
    )


@query(
    "x91_calibration_bins",
    oracle=f"""
    WITH b AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR((l_extendedprice - lo)
                               / ((hi - lo) / {_CAL_BINS}.0)) AS BIGINT),
                   {_CAL_BINS - 1}) AS bin,
             l_extendedprice AS score,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem, b
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           {round6_bin_sql(
               "CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
           )} AS outcome_rate
    FROM binned GROUP BY bin
    """,
)
def x91_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability / calibration table: l_extendedprice as the score,
    l_returnflag='R' as the outcome, {_CAL_BINS} fixed equi-width bins
    between the broadcast global min/max (the x84 bounds pattern — no
    quantile sort), per bin the mean score and observed outcome rate.
    The curve a model-eval pass reads to see whether a score is
    calibrated. Mean score uses the exact-decimal avg recipe; the rate
    is an integer ratio in one double division."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("score"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    )
    b = li.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_CAL_BINS))
    binned = li.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor((F.col("score") - F.col("lo")) / width).cast("long"),
            F.lit(_CAL_BINS - 1).cast("long"),
        ).alias("bin"),
        "score",
        "y",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_score"),
        round6_bin(
            F.sum("y").cast("double") / F.count("*").cast("double")
        ).alias("outcome_rate"),
    )


@query(
    "x93_silhouette_centroid",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
             UNNEST(embedding::DOUBLE[]) AS v
      FROM embeddings
    ),
    cent AS (
      SELECT label AS clabel, dim,
             ROUND(CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE)
                   / COUNT(*), 6) AS c
      FROM flat GROUP BY label, dim
    ),
    d2 AS (
      SELECT f.vec_id, f.label, cent.clabel,
             CAST(SUM(CAST((
               {round6_bin_sql("(f.v - cent.c) * (f.v - cent.c)")}
             ) AS DECIMAL(28,6))) AS DOUBLE) AS ssq
      FROM flat f JOIN cent ON f.dim = cent.dim
      GROUP BY f.vec_id, f.label, cent.clabel
    ),
    ab AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN SQRT(ssq) END) AS a,
             MIN(CASE WHEN clabel <> label THEN SQRT(ssq) END) AS b
      FROM d2 GROUP BY vec_id, label
    ),
    sil AS (
      SELECT label,
             {round6_bin_sql("(b - a) / GREATEST(a, b)")} AS s
      FROM ab
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           {round6_bin_sql(
               "CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE)"
               " / CAST(COUNT(*) AS DOUBLE)"
           )} AS mean_silhouette
    FROM sil GROUP BY label
    """,
)
def x93_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per label: a = Euclidean distance to
    the own-label centroid, b = distance to the nearest other centroid,
    s = (b-a)/max(a,b), averaged per label — the O(n*k) clustering-
    quality score (full silhouette is O(n^2); against centroids it
    scales, the standard large-corpus simplification).

    Plan: posexplode flattens vectors once; the (label x dim) centroid
    frame (c17's exact-decimal mean, 6-dp binned so both engines read
    identical centroid doubles) broadcasts onto the flattened stream
    via a dim equi-join; partial squared diffs reduce by hash agg on
    (vec, candidate-label) — dims never co-locate on one node and
    nothing collects to the driver. Squared-diff terms round 6 dp and
    accumulate in exact DECIMAL; sqrt/max/ratio are identical IEEE
    expressions both sides."""
    from sheetsetl_spark.operators import similarity
    from sheetsetl_spark.operators.skew import widen_to_cores

    emb = load_table(spark, sf_dir, "embeddings")
    # The flattened stream drives the query's only heavy stage — a
    # x|labels| broadcast-join fanout with a per-element 6dp decimal
    # round — and the compact embeddings file exposes ONE split, so the
    # whole d2 map side otherwise runs on one core (r11; the
    # shingles()/c82 pre-explode widen rule; fanout = the 64-dim
    # explode multiplier, it only gates the widen).
    flat = widen_to_cores(emb, fanout=64).select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim0", "v"
        ),
    ).select(
        "vec_id", "label", (F.col("dim0") + 1).alias("dim"), "v"
    )
    cent = similarity.group_centroids(emb).select(
        F.col("label").alias("clabel"), "dim", F.col("centroid").alias("c")
    )
    d2 = (
        flat.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                round6_bin(
                    (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
                ).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("ssq")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.sqrt("ssq"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.sqrt("ssq"))
        ).alias("b"),
    )
    sil = ab.select(
        "label",
        round6_bin(
            (F.col("b") - F.col("a")) / F.greatest("a", "b")
        ).alias("s"),
    )
    return sil.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        round6_bin(
            F.sum(F.col("s").cast("decimal(28,6)")).cast("double")
            / F.count("*").cast("double")
        ).alias("mean_silhouette"),
    )


@query(
    "x94_spearman_corr",
    oracle="""
    WITH pc AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS a,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS b
      FROM orders GROUP BY o_custkey
    ),
    da AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS cnt FROM pc GROUP BY a),
    ra AS (SELECT a, 2 * SUM(cnt) OVER (ORDER BY a) - cnt + 1 AS r2a
           FROM da),
    db AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM pc GROUP BY b),
    rb AS (SELECT b, 2 * SUM(cnt) OVER (ORDER BY b) - cnt + 1 AS r2b
           FROM db),
    j AS (SELECT r2a, r2b FROM pc JOIN ra USING (a) JOIN rb USING (b)),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2a) AS DOUBLE) AS sx, CAST(SUM(r2b) AS DOUBLE) AS sy,
             CAST(SUM(r2a * r2b) AS DOUBLE) AS sxy,
             CAST(SUM(r2a * r2a) AS DOUBLE) AS sxx,
             CAST(SUM(r2b * r2b) AS DOUBLE) AS syy
      FROM j
    )
    SELECT n,
           FLOOR((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy))
                 * 1000000.0 + 0.5) / 1000000.0 AS rho
    FROM s
    """,
)
def x94_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (proper average-ranks-on-ties form)
    between per-customer order count and total spend — the monotonic-
    association check run where Pearson (x40) assumes linearity.

    The average rank of a tied group is (2*cum_before + cnt + 1)/2;
    doubled it is the INTEGER 2*cum_incl - cnt + 1, so ranks stay exact
    and Pearson's scale-invariance lets the whole statistic run on
    doubled ranks. Each variable needs one distinct-value aggregate +
    one ordered cumulative — both via the distributed prefix sum, no
    single-partition corpus window — then an equi-join back to rows and
    one reduce. Doubles appear only in the final five-sum formula
    (identical IEEE expression both engines)."""
    from sheetsetl_spark.operators.prefix import prefix_sum

    pc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("a"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .cast("long")
            .alias("b"),
        )
        .localCheckpoint(eager=False)
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        d = pc.groupBy(col).agg(F.count("*").alias("cnt"))
        c = prefix_sum(
            d, [F.col(col)], F.col("cnt"), out_col="cum",
            bucket_expr=F.col(col),
        )
        return c.select(
            col,
            (F.lit(2) * F.col("cum") - F.col("cnt") + F.lit(1)).alias(out),
        )

    j = pc.join(doubled_ranks("a", "r2a"), "a").join(
        doubled_ranks("b", "r2b"), "b"
    )
    # product sums in exact DECIMAL (terms <= (2n)^2 overflow int64 past
    # ~1.5e9 rows; (18,0)x(18,0) products stay exact in both engines)
    xa = F.col("r2a").cast("decimal(18,0)")
    xb = F.col("r2b").cast("decimal(18,0)")
    s = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(xa).cast("double").alias("sx"),
        F.sum(xb).cast("double").alias("sy"),
        F.sum(xa * xb).cast("double").alias("sxy"),
        F.sum(xa * xa).cast("double").alias("sxx"),
        F.sum(xb * xb).cast("double").alias("syy"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "n",
        round6_bin(
            (n_d * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n_d * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n_d * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("rho"),
    )


@query(
    "c80_modularity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.item AS u, b.item AS v
      FROM items a JOIN items b ON a.g = b.g AND a.item < b.item
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY node
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    br AS (SELECT p_partkey, p_brand FROM part),
    within AS (
      SELECT bu.p_brand AS community, CAST(COUNT(*) AS BIGINT) AS m_within
      FROM e
      JOIN br bu ON bu.p_partkey = e.u
      JOIN br bv ON bv.p_partkey = e.v
      WHERE bu.p_brand = bv.p_brand
      GROUP BY bu.p_brand
    ),
    dsum AS (
      SELECT br.p_brand AS community, CAST(SUM(deg) AS BIGINT) AS deg_sum
      FROM deg JOIN br ON br.p_partkey = deg.node
      GROUP BY br.p_brand
    )
    SELECT community, COALESCE(m_within, 0) AS m_within, deg_sum,
           FLOOR((CAST(COALESCE(m_within, 0) AS DOUBLE)
                    / CAST((SELECT m FROM m) AS DOUBLE)
                  - (CAST(deg_sum AS DOUBLE)
                     / (2.0 * CAST((SELECT m FROM m) AS DOUBLE)))
                    * (CAST(deg_sum AS DOUBLE)
                       / (2.0 * CAST((SELECT m FROM m) AS DOUBLE))))
                 * 1000000.0 + 0.5) / 1000000.0 AS q_term
    FROM dsum LEFT JOIN within USING (community)
    """,
)
def c80_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity terms of the part-brand partition over the
    co-purchase graph: per community c, Q_c = m_c/m - (d_c/2m)^2
    (sum(Q_c) is the partition's modularity — the score a community-
    detection or blocking-key choice is judged by).

    The edge list builds once (the c60/c67 basket equi-join), brands
    attach via two equi-joins on the node key, and both m_c and d_c are
    map-side-combined aggregates over community keys — community count
    is aggregate-sized, the corpus never crosses itself. Left join
    keeps communities with zero internal edges (their Q_c is purely the
    degree penalty). One final double expression per community row."""
    from sheetsetl_spark.queries.mining_ext import _copurchase_edges

    edges = (
        _copurchase_edges(spark, sf_dir)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .localCheckpoint(eager=False)
    )
    br = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("community")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    m_row = edges.agg(F.count("*").alias("m"))
    within = (
        edges.join(
            br.select(F.col("node").alias("u"), F.col("community").alias("cu")),
            "u",
        )
        .join(
            br.select(F.col("node").alias("v"), F.col("community").alias("cv")),
            "v",
        )
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count("*").cast("long").alias("m_within"))
    )
    dsum = (
        deg.join(br, "node")
        .groupBy("community")
        .agg(F.sum("deg").cast("long").alias("deg_sum"))
    )
    md = F.col("m").cast("double")
    half = F.col("deg_sum").cast("double") / (F.lit(2.0) * md)
    return (
        dsum.join(within, "community", "left")
        .crossJoin(F.broadcast(m_row))
        .select(
            "community",
            F.coalesce("m_within", F.lit(0)).cast("long").alias("m_within"),
            "deg_sum",
            round6_bin(
                F.coalesce("m_within", F.lit(0)).cast("double") / md
                - half * half
            ).alias("q_term"),
        )
    )


_PSI_BINS = 10


@query(
    "x95_psi_drift",
    oracle=f"""
    WITH split AS (
      SELECT MIN(EPOCH_US(ts::TIMESTAMP)) + MAX(EPOCH_US(ts::TIMESTAMP))
               AS mid2
      FROM events WHERE event_type = 'purchase'
    ),
    ref AS (
      SELECT value FROM events, split
      WHERE event_type = 'purchase' AND 2 * EPOCH_US(ts::TIMESTAMP) < mid2
    ),
    cur AS (
      SELECT value FROM events, split
      WHERE event_type = 'purchase' AND 2 * EPOCH_US(ts::TIMESTAMP) >= mid2
    ),
    b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM ref),
    rbin AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo)
                     / ((hi - lo) / {_PSI_BINS}.0)) AS BIGINT), 0),
                   {_PSI_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS rc
      FROM ref, b GROUP BY 1
    ),
    cbin AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - lo)
                     / ((hi - lo) / {_PSI_BINS}.0)) AS BIGINT), 0),
                   {_PSI_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cc
      FROM cur, b GROUP BY 1
    ),
    tot AS (SELECT (SELECT SUM(rc) FROM rbin) AS rn,
                   (SELECT SUM(cc) FROM cbin) AS cn),
    cells AS (
      SELECT COALESCE(rbin.bin, cbin.bin) AS bin,
             COALESCE(rc, 0) + 1 AS rs, COALESCE(cc, 0) + 1 AS cs
      FROM rbin FULL OUTER JOIN cbin USING (bin)
    )
    SELECT bin,
           {round6_bin_sql(
               "(CAST(cs AS DOUBLE) / (CAST((SELECT cn FROM tot) AS DOUBLE)"
               f" + {_PSI_BINS})"
               " - CAST(rs AS DOUBLE) / (CAST((SELECT rn FROM tot) AS DOUBLE)"
               f" + {_PSI_BINS}))"
               " * LN((CAST(cs AS DOUBLE) * (CAST((SELECT rn FROM tot)"
               f" AS DOUBLE) + {_PSI_BINS}))"
               " / (CAST(rs AS DOUBLE) * (CAST((SELECT cn FROM tot)"
               f" AS DOUBLE) + {_PSI_BINS})))"
           )} AS psi_term
    FROM cells
    """,
)
def x95_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the purchase-value distribution,
    first half of the event stream (reference) vs second half (current)
    — the standard production drift monitor a curation pipeline runs
    before trusting a score threshold tuned on old data.

    Fixed equi-width bins from the reference min/max (broadcast one-row
    bounds, the x84 pattern — no quantile sort), add-one smoothing on
    both sides so empty bins stay finite, per-bin PSI terms
    (c% - r%)*ln(c%/r%). Two corpus passes (reference + current binned
    counts, each a map-side-combined aggregate); everything after runs
    on the {_PSI_BINS}-row frame. Integer counts enter one identical
    double expression per bin."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "value",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).alias("us"),
        )
    )
    # exact-integer midpoint test: 2*ts_us < min_us + max_us avoids any
    # timestamp division (and matches DuckDB's EPOCH_US twin bit-wise)
    split = ev.agg((F.min("us") + F.max("us")).alias("mid2"))
    tagged = ev.crossJoin(F.broadcast(split)).select(
        "value", (F.lit(2) * F.col("us") < F.col("mid2")).alias("is_ref")
    )
    b = tagged.filter("is_ref").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_PSI_BINS))
    binned = tagged.crossJoin(F.broadcast(b)).select(
        "is_ref",
        F.least(
            F.greatest(
                F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
                F.lit(0).cast("long"),
            ),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    cells = (
        binned.groupBy("bin")
        .agg(
            F.sum(F.col("is_ref").cast("long")).alias("rc"),
            F.sum((~F.col("is_ref")).cast("long")).alias("cc"),
        )
        .select(
            "bin",
            (F.col("rc") + 1).alias("rs"),
            (F.col("cc") + 1).alias("cs"),
        )
    )
    tot = cells.agg(
        (F.sum("rs")).alias("rn_s"), (F.sum("cs")).alias("cn_s")
    )
    # rn_s / cn_s already include the +1-per-OBSERVED-bin smoothing; the
    # oracle smooths with +PSI_BINS over raw totals — match by smoothing
    # over raw totals here too
    raw = binned.agg(
        F.sum(F.col("is_ref").cast("long")).alias("rn"),
        F.sum((~F.col("is_ref")).cast("long")).alias("cn"),
    )
    rp = F.col("rs").cast("double") / (
        F.col("rn").cast("double") + F.lit(float(_PSI_BINS))
    )
    cp = F.col("cs").cast("double") / (
        F.col("cn").cast("double") + F.lit(float(_PSI_BINS))
    )
    return cells.crossJoin(F.broadcast(raw)).select(
        "bin",
        round6_bin(
            (cp - rp)
            * F.log(
                (
                    F.col("cs").cast("double")
                    * (F.col("rn").cast("double") + F.lit(float(_PSI_BINS)))
                )
                / (
                    F.col("rs").cast("double")
                    * (F.col("cn").cast("double") + F.lit(float(_PSI_BINS)))
                )
            )
        ).alias("psi_term"),
    )


@query(
    "x96_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END)
                  AS BIGINT) AS s,
             CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n
      FROM daily a JOIN daily b ON b.d > a.d
    )
    SELECT s, n,
           FLOOR(CAST(s AS DOUBLE)
                 / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) / 18.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS z_approx
    FROM s
    """,
)
def x96_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend statistic over the daily revenue series:
    S = sum over day pairs (i<j) of sign(x_j - x_i), plus the
    no-ties-variance normal approximation z = S/sqrt(n(n-1)(2n+5)/18)
    — the nonparametric is-this-metric-trending test run before
    alerting on drift.

    The corpus collapses to the DAILY aggregate first (map-side
    combine); the O(days^2) pair comparison runs on that aggregate-
    sized frame (365 rows/year — bounded by calendar time, not corpus
    size), so the theta self-join is aggregate x aggregate, never
    corpus-sized. S is exact integer; doubles only in the final z."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("xa"))
    bdf = daily.select(F.col("d").alias("db"), F.col("cents").alias("xb"))
    s = (
        a.join(bdf, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
                .cast("long")
            ).alias("s")
        )
        .crossJoin(
            F.broadcast(daily.agg(F.count("*").cast("long").alias("n")))
        )
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "s",
        "n",
        round6_bin(
            F.col("s").cast("double")
            / F.sqrt(
                n_d * (n_d - 1.0) * (2.0 * n_d + 5.0) / F.lit(18.0)
            )
        ).alias("z_approx"),
    )


_KANON_K = 5


@query(
    "c81_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_kband,
             c_custkey
      FROM customer
    ),
    eq AS (
      SELECT c_nationkey, c_mktsegment, bal_kband,
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT c_custkey % 7) AS BIGINT) AS l_div
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
           CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN class_size
                         ELSE 0 END) AS BIGINT) AS rows_violating_k{_KANON_K},
           {round6_bin_sql(
               f"CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN class_size"
               " ELSE 0 END) AS DOUBLE) / CAST(SUM(class_size) AS DOUBLE)"
           )} AS viol_rate,
           CAST(MIN(l_div) AS BIGINT) AS l_diversity
    FROM eq
    """,
)
def c81_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity profile of the customer table under
    the quasi-identifier (nation, segment, balance-thousand-band): the
    minimum equivalence-class size (k), how many rows sit in classes
    smaller than k={_KANON_K}, and the minimum sensitive-value
    diversity per class (sensitive attribute stood in by custkey%7) —
    the privacy-risk scan a release pipeline runs before publishing a
    derived table.

    One map-side-combined groupBy on the QI key builds the equivalence
    classes; the profile is a one-row reduce over the aggregate frame.
    At 100 TB the class frame is bounded by distinct QI combinations,
    and COUNT(DISTINCT) runs per class (bounded by the sensitive
    domain), never globally."""
    qi = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_kband"),
        (F.col("c_custkey") % 7).alias("sens"),
    )
    eq = qi.groupBy("c_nationkey", "c_mktsegment", "bal_kband").agg(
        F.count("*").alias("class_size"),
        F.countDistinct("sens").alias("l_div"),
    )
    viol = F.sum(
        F.when(F.col("class_size") < _KANON_K, F.col("class_size")).otherwise(
            0
        )
    )
    return eq.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        viol.cast("long").alias(f"rows_violating_k{_KANON_K}"),
        round6_bin(
            viol.cast("double") / F.sum("class_size").cast("double")
        ).alias("viol_rate"),
        F.min("l_div").cast("long").alias("l_diversity"),
    )
