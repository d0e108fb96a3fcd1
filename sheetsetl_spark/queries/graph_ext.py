"""Round-7 batch-2 extensions, graph/scale-tooling tier: fixed-round
PageRank over the customer<->supplier interaction graph, key-skew
diagnostics, bloom-filter join pre-filtering with measured FPR, and
co-purchase pair mining.

The PageRank oracle is an UNROLLED CTE chain (one contribution + sum +
update triple per round, generated below) so DuckDB re-walks every
iteration's arithmetic under the same 6-dp round-then-decimal-sum
contract the Spark operator uses — the whole trajectory is
hash-checked, not just the final ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetsetl_spark.catalog import load_table
from sheetsetl_spark.queries import query

_PR_ITERS = 5
_PR_DAMPING = 0.85


def _pagerank_oracle(iters: int, damping: float) -> str:
    # repr() keeps the float literals bit-identical to the Spark plan's
    # (1.0 - 0.85 in Python is 0.15000000000000002, NOT the double that
    # the SQL literal 0.15 parses to).
    resid, d = repr(1.0 - damping), repr(damping)
    rnd = "1000000.0 + 0.5) / 1000000.0"
    parts = [
        """directed AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
             's' || CAST(l_suppkey AS VARCHAR) AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM directed
      UNION SELECT b AS src, a AS dst FROM directed
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (
      SELECT node, FLOOR(1.0 / n * """
        + rnd
        + """ AS pr FROM nodes, nn
    )"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""c{k} AS (
      SELECT dst, FLOOR(pr / outdeg * {rnd} AS c
      FROM edges JOIN r{k - 1} ON src = node JOIN outdeg USING (src)
    ),
    s{k} AS (
      SELECT dst, CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS s
      FROM c{k} GROUP BY dst
    ),
    r{k} AS (
      SELECT node,
             FLOOR(({resid} / n + {d} * COALESCE(s, 0.0)) * {rnd} AS pr
      FROM nodes LEFT JOIN s{k} ON node = dst, nn
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT node, pr FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS rn
      FROM r{iters}
    ) WHERE rn <= 25
    """


@query("c56_pagerank", oracle=_pagerank_oracle(_PR_ITERS, _PR_DAMPING))
def c56_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative tier: 5-round damped PageRank (d=0.85) over the
    symmetrized customer<->supplier graph (operators/graph.py::
    pagerank_rounded) — distinct trade relationships from orders x lineitem as
    edges, so the rank surfaces the most systemically-connected
    parties. One dst-keyed shuffle per round, broadcast node count,
    rank state distributed throughout; top-25 via
    TakeOrderedAndProject."""
    from sheetsetl_spark.operators import graph

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    directed = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = directed.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(directed.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    ranks = graph.pagerank_rounded(edges, iters=_PR_ITERS, damping=_PR_DAMPING)
    return ranks.orderBy(F.col("pr").desc(), F.col("node")).limit(25)


@query(
    "c57_skew_report",
    oracle="""
    WITH counts AS (
      SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS keys FROM counts)
    SELECT key, cnt,
           ROUND(cnt / CAST(total AS DOUBLE), 6) AS share,
           ROUND(cnt / (CAST(total AS DOUBLE) / keys), 6) AS skew_ratio,
           CAST(LEAST(CEIL(cnt / (CAST(total AS DOUBLE) / keys)), 32)
                AS INTEGER) AS suggested_salt
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rn
      FROM counts, stats
    ) WHERE rn <= 10
    """,
)
def c57_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale tooling: key-skew diagnostics over the events feed's
    user_id (operators/skew.py::skew_report) — the hottest keys, their
    corpus share, skew ratio vs the mean key, and the salt factor that
    would level each (the decision input for salted_join/x38 vs AQE's
    skew split). One keyed aggregate + broadcast totals; O(top) output."""
    from sheetsetl_spark.operators import skew

    events = load_table(spark, sf_dir, "events")
    return skew.skew_report(events, "user_id", top=10)


def _bloom_pos_sql(i: int, key: str, width: int) -> str:
    return (
        f"('0x' || SUBSTRING(MD5(CONCAT('{i}:', CAST({key} AS VARCHAR))), 1, 15))"
        f"::BIGINT % {width}"
    )


_BLOOM_WIDTH = 16384
_BLOOM_K = 3


@query(
    "c59_bloom_prefilter",
    oracle=f"""
    WITH build AS (
      SELECT o_orderkey AS bk FROM orders WHERE o_totalprice > 450000
    ),
    bits AS (
      SELECT DISTINCT {_bloom_pos_sql('i', 'bk', _BLOOM_WIDTH).replace("'i:'", "CAST(i AS VARCHAR) || ':'")} AS pos
      FROM build, (SELECT UNNEST(GENERATE_SERIES(0, {_BLOOM_K - 1})) AS i) d
    ),
    ann AS (
      SELECT l_returnflag,
             {" AND ".join(f"({_bloom_pos_sql(i, 'l_orderkey', _BLOOM_WIDTH)} IN (SELECT pos FROM bits))" for i in range(_BLOOM_K))}
               AS pass,
             l_orderkey IN (SELECT bk FROM build) AS is_true
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(pass AS INT)) AS BIGINT) AS n_passed,
           CAST(SUM(CAST(is_true AS INT)) AS BIGINT) AS n_true,
           CAST(SUM(CAST(pass AND NOT is_true AS INT)) AS BIGINT) AS n_false_pos,
           ROUND(SUM(CAST(pass AND NOT is_true AS INT))
                 / CAST(SUM(CAST(NOT is_true AS INT)) AS DOUBLE), 6) AS fpr
    FROM ann GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def c59_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale tooling: bloom-filter join pre-filter accounting
    (operators/bloom.py::bloom_fpr_report) — a 16384-bit k=3 filter
    built from the high-value orders keys prunes the lineitem probe
    WITHOUT shuffling it (k broadcast joins against the bounded
    position table), and the report measures rows passed, true members,
    false positives, and the realized FPR per return flag. No false
    negatives by construction (pytest-pinned); the FPR here is the
    width/k sizing feedback a real deployment tunes on."""
    from sheetsetl_spark.operators import bloom

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(F.col("o_totalprice") > 450000)
    return bloom.bloom_fpr_report(
        li, build, "l_orderkey", "o_orderkey", "l_returnflag",
        width=_BLOOM_WIDTH, k=_BLOOM_K,
    )


@query(
    "c60_copurchase_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM items a JOIN items b ON a.g = b.g AND a.item < b.item
    )
    SELECT item_a, item_b, n_groups FROM (
      SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_groups,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, item_a, item_b) AS rn
      FROM pairs GROUP BY item_a, item_b
    ) WHERE rn <= 20
    """,
)
def c60_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket tier: top co-purchased part pairs across orders
    (operators/graph.py::cooccurrence_pairs) — the association-mining
    primitive (the candidate-generation step of apriori's second pass).
    Per-order distinct items first, self-equi-join on the order key with
    the a<b half-pair predicate, so fanout is quadratic only within an
    order (TPC-H baskets are <= 7 lines; the operator's max_group_size
    cap guards real-world degenerate baskets)."""
    from sheetsetl_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    return graph.cooccurrence_pairs(li, "l_orderkey", "l_partkey", top=20)
