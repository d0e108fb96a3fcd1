"""Round-7 batch-7 extensions, evaluation / feature-selection /
data-profiling tier: exact two-sample Kolmogorov-Smirnov, exact ROC AUC
via the Mann-Whitney rank-sum identity, Gini concentration index,
bounded k-hop graph reachability, information gain per candidate
feature, mutual information between categorical columns, and
functional-dependency violation profiling.

These are the "is this dataset/feature/embedding any good" measurements
a training-data pipeline runs between curation passes — the reference
delegates such report SQL to MySQL wholesale (reference
src/loader.py:231); here each is a distributed plan built to survive
100 TB:

- KS / AUC / Gini all need a GLOBAL ordered cumulative — the classic
  single-partition-window scale-killer. All three go through
  ``operators/prefix.py::prefix_sum`` (range-partition + local scans +
  broadcast offsets) after first collapsing the corpus to one row per
  DISTINCT score via a map-side-combining aggregate, so the only
  ordered pass runs over the distinct-value frame, fully parallel.
- All three also stay in EXACT integer/decimal arithmetic until one
  final division (doubles enter only at the last step), so the result
  is bit-stable across engines and partitionings with no per-term
  rounding recipe needed.
- Info gain / MI / FD profiling are two-level categorical aggregates:
  the corpus-touching pass is a single map-side-combined groupBy on
  (feature, value, label)-style keys; everything after runs on the
  aggregate-sized frame.

Registry determinism contract as usual (queries/__init__.py): floats
round 6 dp binary-wise, entropy terms round per-term and accumulate in
exact DECIMAL (the c73 recipe), every money double is binned to integer
cents with the FLOOR(x*100+0.5) form before any arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.operators.prefix import prefix_sum
from sheetsetl_spark.operators.text import round6_bin, round6_bin_sql
from sheetsetl_spark.queries import query
from sheetsetl_spark.queries.mining_ext import _EDGES_SQL, _copurchase_edges

_KHOP_SEEDS = 5
_KHOP_DEPTH = 3


@query(
    "x85_ks_two_sample",
    oracle="""
    WITH pts AS (
      SELECT o_totalprice AS x,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cf,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                  AS BIGINT) AS co
      FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY o_totalprice
    ),
    tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS nf,
                   CAST(SUM(co) AS BIGINT) AS no_ FROM pts),
    cum AS (
      SELECT ABS(SUM(cf * (SELECT no_ FROM tot)
                     - co * (SELECT nf FROM tot))
                 OVER (ORDER BY x)) AS absdiff
      FROM pts
    )
    SELECT nf AS n_f, no_ AS n_o,
           FLOOR(CAST((SELECT MAX(absdiff) FROM cum) AS DOUBLE)
                 / (CAST(nf AS DOUBLE) * CAST(no_ AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS d_stat
    FROM tot
    """,
)
def x85_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between the o_totalprice
    distributions of finished ('F') vs open ('O') orders.

    Scale shape: the corpus collapses to one row per DISTINCT price
    (map-side-combined groupBy), the signed step value
    cf*n_o - co*n_f is formed per row in DECIMAL(38,0) (exact at any
    n), and the ONE ordered pass is a distributed prefix sum over the
    distinct-value frame — no single-partition corpus window. D is
    max|cum|/(n_f*n_o), computed by one final double division, so the
    whole statistic is exact-integer until the last step."""
    pts = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy(F.col("o_totalprice").alias("x"))
        .agg(
            F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("cf"),
            F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("co"),
        )
    )
    tot = pts.agg(
        F.sum("cf").alias("nf"), F.sum("co").alias("no")
    )
    # BIGINT throughout: |step| <= n and |cum| <= nf*no, so the exact-
    # integer path holds to ~3e9 rows per side; past that swap the step
    # to DECIMAL(38,0) (same plan, wider accumulator).
    stepped = pts.crossJoin(F.broadcast(tot)).select(
        "x",
        "nf",
        "no",
        (F.col("cf") * F.col("no") - F.col("co") * F.col("nf")).alias("step"),
    )
    cum = prefix_sum(
        stepped, [F.col("x")], F.col("step"), out_col="cum",
        bucket_expr=F.col("x"),
    )
    return cum.agg(
        F.max("nf").cast("long").alias("n_f"),
        F.max("no").cast("long").alias("n_o"),
        round6_bin(
            F.max(F.abs(F.col("cum"))).cast("double")
            / (F.max("nf").cast("double") * F.max("no").cast("double"))
        ).alias("d_stat"),
    )


@query(
    "x86_auc_rank",
    oracle="""
    WITH pts AS (
      SELECT l_extendedprice AS x,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS neg
      FROM lineitem GROUP BY l_extendedprice
    ),
    cum AS (
      SELECT pos, neg,
             SUM(neg) OVER (ORDER BY x) AS cumneg
      FROM pts
    ),
    u AS (
      SELECT SUM(pos * (2 * cumneg - neg)) AS u2,
             SUM(pos) AS npos, SUM(neg) AS nneg
      FROM cum
    )
    SELECT CAST(npos AS BIGINT) AS n_pos, CAST(nneg AS BIGINT) AS n_neg,
           FLOOR(CAST(u2 AS DOUBLE)
                 / (2.0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS auc
    FROM u
    """,
)
def x86_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the score l_extendedprice predicting
    l_returnflag='R', via the Mann-Whitney rank-sum identity with the
    standard tie correction (ties contribute half).

    2U = sum over distinct scores of pos*(2*cum_neg_below + neg_at) =
    sum pos*(2*cum_neg_incl - neg_at); AUC = U/(n_pos*n_neg). The
    corpus collapses to distinct scores first, the cumulative runs
    through the distributed prefix sum, and everything stays exact
    DECIMAL(38,0) integer arithmetic until the single final division —
    no per-term rounding needed, bit-stable across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.groupBy(F.col("l_extendedprice").alias("x")).agg(
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("pos"),
        F.sum((F.col("l_returnflag") != "R").cast("long")).alias("neg"),
    )
    # BIGINT throughout: 2U <= 2*n_pos*n_neg, exact in int64 to ~3e9
    # rows (past that: DECIMAL(38,0) accumulator, same plan).
    cum = prefix_sum(
        pts, [F.col("x")], F.col("neg"), out_col="cumneg",
        bucket_expr=F.col("x"),
    )
    return cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        round6_bin(
            F.sum(
                F.col("pos") * (F.lit(2) * F.col("cumneg") - F.col("neg"))
            ).cast("double")
            / (
                F.lit(2.0)
                * F.sum("pos").cast("double")
                * F.sum("neg").cast("double")
            )
        ).alias("auc"),
    )


@query(
    "x88_gini_index",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey)
                  AS BIGINT) AS rnk
      FROM spend
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(cents AS DECIMAL(18,0))) AS sx,
             SUM(CAST(rnk AS DECIMAL(18,0))
                 * CAST(cents AS DECIMAL(18,0))) AS srx
      FROM ranked
    )
    SELECT n,
           FLOOR((2.0 * CAST(srx AS DOUBLE)
                  - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS gini
    FROM s
    """,
)
def x88_gini_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration index of per-customer order spend — the
    inequality measure a sampling/mix-rebalancing pass reads to decide
    whether a handful of heavy sources dominate a corpus.

    G = (2*sum(rank_i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i)) over
    ascending-sorted x (tie order is irrelevant: equal x swap ranks
    without changing the sum). Money doubles bin to integer cents with
    the FLOOR(x*100+0.5) form, the global rank is a distributed prefix
    sum of 1 over the (cents, custkey) unique order, and the rank*x
    accumulation runs in exact DECIMAL — one double division at the
    end."""
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
    ranked = prefix_sum(
        spend,
        [F.col("cents"), F.col("o_custkey")],
        F.lit(1).cast("long"),
        out_col="rnk",
        bucket_expr=F.col("cents"),
    )
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(18,0)")).alias("sx"),
        F.sum(
            F.col("rnk").cast("decimal(18,0)")
            * F.col("cents").cast("decimal(18,0)")
        ).alias("srx"),
    )
    # Final step in doubles on both engines (exact decimals in, one
    # identical IEEE expression out — deterministic without needing a
    # >38-digit decimal product for (n+1)*sx).
    return s.select(
        "n",
        round6_bin(
            (
                F.lit(2.0) * F.col("srx").cast("double")
                - (F.col("n").cast("double") + F.lit(1.0))
                * F.col("sx").cast("double")
            )
            / (F.col("n").cast("double") * F.col("sx").cast("double"))
        ).alias("gini"),
    )


@query(
    "x87_khop_reach",
    oracle=f"""
    WITH RECURSIVE {_EDGES_SQL},
    nodes AS (
      SELECT node FROM (
        SELECT u AS node FROM e UNION SELECT v FROM e
      ) ORDER BY node LIMIT {_KHOP_SEEDS}
    ),
    sym AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e),
    reach(seed, node, depth) AS (
      SELECT node, node, 0 FROM nodes
      UNION
      SELECT r.seed, sym.d, r.depth + 1
      FROM reach r JOIN sym ON sym.s = r.node
      WHERE r.depth < {_KHOP_DEPTH}
    )
    SELECT seed, CAST(COUNT(DISTINCT node) - 1 AS BIGINT) AS n_reach
    FROM reach GROUP BY seed
    """,
)
def x87_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth reachability: for the {_KHOP_SEEDS} smallest node
    ids of the co-purchase graph (c60's edge set), the number of
    distinct nodes within {_KHOP_DEPTH} undirected hops — the
    neighborhood-size probe run before choosing a community/blocking
    granularity.

    Fixed-depth BFS as {_KHOP_DEPTH} join rounds with an anti-join
    against the visited set each round (frontier-only expansion — a
    node is never re-expanded, so per-round work is bounded by the NEW
    frontier x degree, not cumulative reach). The edge list is lazily
    checkpointed once and reused by all rounds. The oracle is DuckDB's
    own depth-bounded WITH RECURSIVE — an independent engine's BFS, not
    a mirror."""
    sym_half = _copurchase_edges(spark, sf_dir)
    sym = (
        sym_half.select(F.col("src").alias("s"), F.col("dst").alias("d"))
        .unionAll(
            sym_half.select(F.col("dst").alias("s"), F.col("src").alias("d"))
        )
        .localCheckpoint(eager=False)
    )
    seeds = (
        sym.select(F.col("s").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(_KHOP_SEEDS)
    )
    frontier = seeds.select("seed", F.col("seed").alias("node"))
    visited = frontier
    for _ in range(_KHOP_DEPTH):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["s"])
            .select("seed", F.col("d").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt)
        frontier = nxt
    counts = (
        visited.filter(F.col("node") != F.col("seed"))
        .groupBy("seed")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    # left join back to seeds so an isolated seed still reports 0 (the
    # oracle's COUNT(DISTINCT)-1 keeps the depth-0 row).
    return seeds.join(counts, "seed", "left").select(
        "seed", F.coalesce("cnt", F.lit(0)).cast("long").alias("n_reach")
    )


_ENT_DEC = "DECIMAL(28,6)"


def _h_sql(cnt: str, n: str) -> str:
    """DuckDB fragment: one entropy term -p*ln(p), round6-binned (the
    c73 per-term recipe; accumulate with SUM(CAST(.. AS DECIMAL))."""
    p = f"(CAST({cnt} AS DOUBLE) / CAST({n} AS DOUBLE))"
    return round6_bin_sql(f"-({p}) * LN({p})")


def _h_col(cnt, n):
    """Spark twin of :func:`_h_sql`."""
    p = cnt.cast("double") / n.cast("double")
    return round6_bin(-p * F.log(p))


def _ent_sum(col):
    """Exact-decimal accumulation of per-term entropies -> double."""
    return round6_bin(F.sum(col.cast(_ENT_DEC)).cast("double"))


def _ent_sum_sql(term: str) -> str:
    return round6_bin_sql(f"CAST(SUM(CAST(({term}) AS {_ENT_DEC})) AS DOUBLE)")


@query(
    "c75_info_gain",
    oracle=f"""
    WITH feat AS (
      SELECT 'linestatus' AS feature, l_linestatus AS fval,
             l_returnflag AS label FROM lineitem
      UNION ALL
      SELECT 'qty_bucket',
             CAST(CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS VARCHAR),
             l_returnflag FROM lineitem
      UNION ALL
      SELECT 'ship_month', CAST(MONTH(l_shipdate) AS VARCHAR),
             l_returnflag FROM lineitem
    ),
    cells AS (
      SELECT feature, fval, label, CAST(COUNT(*) AS BIGINT) AS c
      FROM feat GROUP BY feature, fval, label
    ),
    valcells AS (
      SELECT feature, fval, c,
             SUM(c) OVER (PARTITION BY feature, fval) AS nv
      FROM cells
    ),
    vals AS (
      SELECT feature, fval, nv,
             {_ent_sum_sql(_h_sql("c", "nv"))} AS ent_v
      FROM valcells GROUP BY feature, fval, nv
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
    cond AS (
      SELECT feature,
             {_ent_sum_sql(
                 round6_bin_sql(
                     "(CAST(nv AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE))"
                     " * ent_v"
                 )
             )} AS h_cond
      FROM vals GROUP BY feature
    ),
    lab AS (
      SELECT l_returnflag AS label, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY l_returnflag
    ),
    hl AS (
      SELECT {_ent_sum_sql(_h_sql("c", "(SELECT n FROM n)"))} AS h_label
      FROM lab
    )
    SELECT feature, h_label, h_cond,
           {round6_bin_sql("h_label - h_cond")} AS info_gain
    FROM cond, hl
    """,
)
def c75_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of three candidate categorical features
    (linestatus, quantity decile-bucket, ship month) w.r.t. the label
    l_returnflag — the feature-selection scan a labeling/routing
    pipeline runs before committing to a split column.

    One corpus pass: the three features unpivot via an inline stack (3x
    row multiplier, no extra scans), then a single map-side-combined
    groupBy on (feature, value, label). Everything after — per-value
    entropy, the nv/n weighting, H(label) — runs on the aggregate-sized
    cell frame. Entropy terms follow the c73 round6+DECIMAL recipe at
    every accumulation level."""
    li = load_table(spark, sf_dir, "lineitem")
    feat = li.select(
        F.expr(
            "stack(3,"
            " 'linestatus', l_linestatus,"
            " 'qty_bucket', CAST(CAST(FLOOR(l_quantity / 10.0) AS BIGINT)"
            "               AS STRING),"
            " 'ship_month', CAST(MONTH(l_shipdate) AS STRING)"
            ") AS (feature, fval)"
        ),
        F.col("l_returnflag").alias("label"),
    )
    # ONE corpus pass: the cell frame is lazily checkpointed and every
    # downstream marginal (per-value entropy, label counts, n) derives
    # from it — no second or third lineitem scan.
    cells = (
        feat.groupBy("feature", "fval", "label")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    w_v = Window.partitionBy("feature", "fval")
    vals = (
        cells.withColumn("nv", F.sum("c").over(w_v))
        .groupBy("feature", "fval", "nv")
        .agg(_ent_sum(_h_col(F.col("c"), F.col("nv"))).alias("ent_v"))
    )
    n_row = cells.filter(F.col("feature") == "linestatus").agg(
        F.sum("c").alias("n")
    )
    cond = (
        vals.crossJoin(F.broadcast(n_row))
        .groupBy("feature")
        .agg(
            _ent_sum(
                round6_bin(
                    (F.col("nv").cast("double") / F.col("n").cast("double"))
                    * F.col("ent_v")
                )
            ).alias("h_cond")
        )
    )
    lab = (
        cells.filter(F.col("feature") == "linestatus")
        .groupBy("label")
        .agg(F.sum("c").alias("c"))
    )
    hl = lab.crossJoin(F.broadcast(n_row)).agg(
        _ent_sum(_h_col(F.col("c"), F.col("n"))).alias("h_label")
    )
    return cond.crossJoin(F.broadcast(hl)).select(
        "feature",
        "h_label",
        "h_cond",
        round6_bin(F.col("h_label") - F.col("h_cond")).alias("info_gain"),
    )


@query(
    "c76_mutual_information",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY lang, source
    ),
    m AS (
      SELECT c,
             SUM(c) OVER (PARTITION BY lang) AS rl,
             SUM(c) OVER (PARTITION BY source) AS cs,
             SUM(c) OVER () AS n
      FROM cells
    ),
    mi AS (
      SELECT {_ent_sum_sql(
          round6_bin_sql(
              "(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
              " * LN((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))"
              "      / (CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)))"
          )
      )} AS mi FROM m
    ),
    lm AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents
           GROUP BY lang),
    sm AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM documents
           GROUP BY source),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    hl AS (SELECT {_ent_sum_sql(_h_sql("c", "(SELECT n FROM n)"))} AS h_lang
           FROM lm),
    hs AS (SELECT {_ent_sum_sql(_h_sql("c", "(SELECT n FROM n)"))} AS h_source
           FROM sm)
    SELECT mi, h_lang, h_source,
           {round6_bin_sql("mi / SQRT(h_lang * h_source)")} AS nmi
    FROM mi, hl, hs
    """,
)
def c76_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between a corpus's language and source
    columns, plus both marginal entropies and the sqrt-normalized NMI —
    the association scan that tells a mix-weighting pass whether two
    stratification axes are redundant.

    The only corpus-touching pass is the (lang, source) cell count
    (map-side combine); marginals come from windows over the tiny cell
    frame. Terms use exact integer counts inside deterministic double
    ops, round 6 dp per term, and accumulate in exact DECIMAL (the c73
    recipe)."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus pass: every marginal derives from the lazily
    # checkpointed cell frame.
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    m = cells.select(
        "c",
        F.sum("c").over(Window.partitionBy("lang")).alias("rl"),
        F.sum("c").over(Window.partitionBy("source")).alias("cs"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    mi = m.agg(
        _ent_sum(
            round6_bin(
                (F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(
                    (F.col("c").cast("double") * F.col("n").cast("double"))
                    / (F.col("rl").cast("double") * F.col("cs").cast("double"))
                )
            )
        ).alias("mi")
    )
    n_row = cells.agg(F.sum("c").alias("n"))
    hl = (
        cells.groupBy("lang")
        .agg(F.sum("c").alias("c"))
        .crossJoin(F.broadcast(n_row))
        .agg(_ent_sum(_h_col(F.col("c"), F.col("n"))).alias("h_lang"))
    )
    hs = (
        cells.groupBy("source")
        .agg(F.sum("c").alias("c"))
        .crossJoin(F.broadcast(n_row))
        .agg(_ent_sum(_h_col(F.col("c"), F.col("n"))).alias("h_source"))
    )
    return (
        mi.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hs))
        .select(
            "mi",
            "h_lang",
            "h_source",
            round6_bin(
                F.col("mi") / F.sqrt(F.col("h_lang") * F.col("h_source"))
            ).alias("nmi"),
        )
    )


_FDS = [
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
    ("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
]


def _fd_sql(name: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           {round6_bin_sql(
               "CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS DOUBLE)"
               " / CAST(COUNT(*) AS DOUBLE)"
           )} AS viol_rate,
           {round6_bin_sql(
               "CAST(SUM(n_rows) - SUM(max_c) AS DOUBLE)"
               " / CAST(SUM(n_rows) AS DOUBLE)"
           )} AS g3
    FROM (
      SELECT {lhs}, CAST(COUNT(*) AS BIGINT) AS n_rhs,
             SUM(c) AS n_rows, MAX(c) AS max_c
      FROM (SELECT {lhs}, {rhs}, CAST(COUNT(*) AS BIGINT) AS c
            FROM {table} GROUP BY {lhs}, {rhs})
      GROUP BY {lhs}
    )
    """


@query(
    "c77_fd_violations",
    oracle=" UNION ALL ".join(_fd_sql(*fd) for fd in _FDS),
)
def c77_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency violation profile for three candidate FDs
    (brand->type, custkey->orderpriority, nationkey->mktsegment): per
    FD, the number of LHS groups, how many of them map to >1 distinct
    RHS, the group violation rate, and the g3 error (minimum fraction
    of rows to delete to make the FD hold — the standard approximate-FD
    measure). The schema-inference scan a curation pipeline runs before
    trusting a column as a join/partition key.

    Per FD: one map-side-combined groupBy on (lhs, rhs), a second on
    lhs over the aggregate frame, then a 1-row reduce. Each table is
    scanned once; the three 1-row results union."""

    def one(name: str, table: str, lhs: str, rhs: str) -> DataFrame:
        cell = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs, rhs)
            .agg(F.count("*").alias("c"))
        )
        grp = cell.groupBy(lhs).agg(
            F.count("*").alias("n_rhs"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_c"),
        )
        return grp.agg(
            F.count("*").cast("long").alias("n_lhs"),
            F.sum((F.col("n_rhs") > 1).cast("long")).alias("n_violating"),
            round6_bin(
                F.sum((F.col("n_rhs") > 1).cast("long")).cast("double")
                / F.count("*").cast("double")
            ).alias("viol_rate"),
            round6_bin(
                (F.sum("n_rows") - F.sum("max_c")).cast("double")
                / F.sum("n_rows").cast("double")
            ).alias("g3"),
        ).select(
            F.lit(name).alias("fd"),
            "n_lhs",
            "n_violating",
            "viol_rate",
            "g3",
        )

    out = None
    for fd in _FDS:
        part = one(*fd)
        out = part if out is None else out.unionAll(part)
    return out
