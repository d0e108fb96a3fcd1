"""Graph operators: fixed-iteration weighted PageRank.

Complements operators/dedup.py::connected_components (the other iterative
graph primitive): PageRank ranks nodes by stationary visit probability —
domain authority for crawl prioritization, influence scoring over
citation/link graphs in corpus curation.

Scale design: each iteration is one join of the edge list against the
current rank vector (both keyed on src — co-partitioned after the first
shuffle) plus one aggregation keyed on dst. No driver-side state, no
collect; iteration count is fixed and small, so the plan stays static
(checkpoint between rounds past ~10 iterations, like
functions/iterative.py does for the recursive fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sheetsetl_spark.operators.text import round6_bin


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    deterministic_fold: bool = True,
) -> DataFrame:
    """Weighted PageRank, ``iters`` fixed rounds from a uniform start.

    rank_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_t(u) * w(u,v) / out_w(u)

    (no dangling-mass redistribution: every src in ``edges`` has
    out-weight by construction; nodes with no in-edges settle at
    (1-d)/N).

    ``deterministic_fold=True`` sums each node's incoming contributions
    in src order via an explicit sorted fold, so the double arithmetic is
    bit-identical on ANY partitioning and engine — that makes the full
    iterative pipeline DuckDB-hash-checkable. The fold materializes one
    array per destination node, fine up to ~1e5 in-degree hubs; for
    power-law web graphs pass ``deterministic_fold=False`` to use a
    plain associative sum (order-dependent in the last ulp, still
    convergent — standard practice at that scale).
    """
    # explode, not self-union: the union form would evaluate the edges
    # subtree twice (it may itself be a join pipeline)
    nodes = (
        edges.select(F.explode(F.array(F.col(src), F.col(dst))).alias("node"))
        .distinct()
    )
    outw = edges.groupBy(src).agg(F.sum(weight).alias("__ow"))
    n_nodes = nodes.agg(F.count("*").cast("double").alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    e = edges.join(outw, src).select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        (F.col(weight) / F.col("__ow")).alias("__share"),
    )
    for _ in range(iters):
        contrib = e.join(ranks, e["__src"] == ranks["node"]).select(
            F.col("__dst").alias("node"),
            "__src",
            (F.col("rank") * F.col("__share")).alias("__c"),
        )
        if deterministic_fold:
            summed = contrib.groupBy("node").agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("__src"), F.col("__c")))),
                        lambda x: x["__c"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("__s")
            )
        else:
            summed = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 10).alias("rank"))


def pagerank_rounded(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Unweighted fixed-round PageRank under the 6-dp round-then-
    decimal-sum contract (contrast :func:`pagerank` above, the weighted
    form whose determinism comes from a src-ordered fold instead):
    every per-round float — the contribution r(u)/outdeg(u) and the
    updated rank — rounds to 6 dp immediately and in-edge contributions
    accumulate in exact DECIMAL, so both engines walk bit-identical
    rank vectors round by round and an unrolled CTE chain hash-checks
    every iteration (c56). Symmetrize the edge list first for an
    undirected graph (which also removes dangling-node mass).

    Scale shape: one dst-keyed shuffle per round; out-degrees computed
    once; node count is a broadcast one-row aggregate; rank state stays
    distributed. Output: (node, pr) after ``iters`` rounds.
    """
    s, d = F.col(src_col), F.col(dst_col)
    e = edges.select(s.alias("src"), d.alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_row = nodes.agg(F.count("*").cast("double").alias("n"))
    r = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            e.join(r, e["src"] == r["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                F.round(F.col("pr") / F.col("outdeg"), 6).alias("c"),
            )
        )
        sums = contrib.groupBy("dst").agg(
            F.sum(F.col("c").cast("decimal(28,6)")).cast("double").alias("s")
        )
        r = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .crossJoin(F.broadcast(n_row))
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
        )
    return r


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    top: int = 20,
    max_group_size: int | None = None,
) -> DataFrame:
    """Market-basket co-occurrence: the most frequent unordered item
    pairs sharing a group (order, session, document...).

    Scale shape (r11, hot-group-guarded r12): ONE shuffle of the raw
    membership stream into per-group sorted distinct-item arrays
    (``collect_set`` dedups map-side, so the old separate ``distinct``
    exchange is gone), pairs generated IN-ARRAY via the two-level
    explode of :func:`_pair_stream` (per-row memory bounded at
    O(group size) even for a viral mega-group — the array is sorted, so
    item_a < item_b by construction), then one pair aggregation. The
    r10 form self-joined the stream on the group key, which cost two
    more exchanges of the full stream (distinct + join build) for the
    same within-group quadratic fanout. The optional ``max_group_size``
    cap (the max_bucket_size precedent from MinHash-LSH) still drops
    degenerate mega-groups before they square.
    Top-N is TakeOrderedAndProject.

    Output: (item_a, item_b, n_groups) for the ``top`` pairs, ties
    broken by (item_a, item_b).
    """
    grouped = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("arr"))
        .select("arr", F.size("arr").alias("__gs"))
        .filter(F.col("__gs") >= 2)
    )
    if max_group_size is not None:
        grouped = grouped.filter(F.col("__gs") <= max_group_size)
    pairs = _pair_stream(grouped)
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_groups"))
        .orderBy(F.col("n_groups").desc(), F.col("item_a"), F.col("item_b"))
        .limit(top)
    )


def _pair_stream(grouped: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """All item pairs i < j of each row's sorted distinct ``arr`` column
    (with ``__gs`` = size(arr)) as rows (item_a, item_b) plus the
    ``carry`` columns; sortedness makes item_a < item_b by construction.

    TWO-LEVEL explode (r12 hot-group guard, guide §2.5): the r11 form
    materialized the whole |g|·(|g|-1)/2 pair array on a SINGLE row
    before exploding it — one viral mega-group (a catch-all order, a
    boilerplate document) would build a billions-element array inside
    one task and OOM it. Exploding the head index first and the
    tail slice second emits the identical pair multiset while bounding
    every intermediate row at O(|g|) elements; the quadratic pair
    STREAM is unavoidable (it is the operator's output), but it now
    flows through the pipelined Generate->Generate->partial-aggregate
    span row by row instead of sitting in one allocation. Normal-sized
    groups keep the same one-shuffle plan shape (two Generates replace
    one; no new exchange). ``max_group_size`` remains the explicit
    drop-the-degenerates cap upstream."""
    heads = grouped.select(
        *carry,
        "arr",
        "__gs",
        F.explode(F.expr("sequence(0, __gs - 2)")).alias("__i"),
    )
    return heads.select(
        *carry,
        F.expr("arr[__i]").alias("item_a"),
        F.explode(F.expr("slice(arr, __i + 2, __gs - __i - 1)")).alias("item_b"),
    )


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count + global clustering coefficient, the
    degree-ordered-orientation algorithm (Suri & Vassilvitskii's MR
    triangle counting; also Latapy's compact-forward).

    Scale shape — the reason this survives 100 TB where the naive
    3-way edge self-join does not: every edge is ORIENTED from its
    lower-(degree, id) endpoint to its higher one, which bounds every
    node's OUT-degree by O(sqrt(m)) regardless of how skewed the raw
    degree distribution is (a hub of degree d only keeps out-edges to
    neighbors of even higher degree, and there can be at most ~sqrt(2m)
    nodes of degree >= sqrt(2m)). The wedge join therefore fans out
    quadratically only in out-degree, giving the optimal O(m^1.5) work
    bound; each triangle is found exactly once (at its lowest-key apex).

    Three shuffles total: canonical-edge distinct, the degree
    aggregation, and the wedge self-join + closing-edge semi-join
    (both keyed on node/edge — AQE handles residual skew).

    Returns one row: n_nodes, n_edges, n_wedges, n_triangles,
    global_clustering = 3*triangles / wedges (round 6; wedges counted
    on the undirected graph as sum(deg*(deg-1)/2)).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    o1 = oriented.select(F.col("a"), F.col("b").alias("b1"), F.col("db").alias("db1"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("b2"), F.col("db").alias("db2"))
    wedges_dir = o1.join(o2, "a").filter(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
    )
    closing = oriented.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tri = wedges_dir.join(closing, ["b1", "b2"], "left_semi").agg(
        F.count("*").alias("n_triangles")
    )
    # per-node deg*(deg-1) is always even, so halve BEFORE summing and
    # the whole wedge count stays exact BIGINT (sum/2 in double would
    # lose exactness past 2^53 at web scale)
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).alias("n_wedges"),
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            round6_bin(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
            ).alias("global_clustering"),
        )
    )


def degree_assortativity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all DIRECTED edge instances
    (each undirected edge counted in both directions, the standard
    convention). Positive = hubs attach to hubs (social nets),
    negative = hubs attach to leaves (tech/biological nets) — the
    one-scalar health check for whether a sampled/pruned graph kept
    the original's mixing structure.

    Determinism: degrees are exact integers, so all five correlation
    moments (Sx, Sy, Sxy, Sxx, Syy) accumulate as exact BIGINT sums —
    no float order-dependence anywhere; the final coefficient is one
    double expression over exact integers, bit-identical on any
    partitioning and engine.

    Scale: one distinct, one degree aggregation, two broadcast-size
    joins keyed on node, one global agg. No quadratic step.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # both directions: (du, dv) and (dv, du)
    ed = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    both = ed.select(F.col("du").alias("x"), F.col("dv").alias("y")).unionAll(
        ed.select(F.col("dv").alias("x"), F.col("du").alias("y"))
    )
    m = both.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    # Combine moments in DOUBLE, not BIGINT: n*sxy overflows int64 near
    # ~1e9 edge ends, and IEEE double ops on identical exact-int inputs
    # are bit-identical across engines (the oracle parenthesizes the
    # same way), so determinism survives the cast.
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return m.select(
        F.col("n").alias("n_edge_ends"),
        round6_bin(num / den).alias("assortativity"),
    )


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core peeling, ``rounds`` fixed iterations: repeatedly drop
    nodes of degree < k (with their edges) — the standard dense-subgraph
    extraction / graph-cleaning primitive (Seidman 1983; public
    algorithm). Converged when a round removes nothing; a fixed small
    round count keeps the whole computation an unrolled, engine-portable
    plan (the c56 pagerank precedent) — production callers raise
    ``rounds`` or loop on a one-scalar removed-count action.

    Scale shape: each round is one degree aggregation + two semi-joins
    keyed on node — never materializes anything per-pair. Each round's
    edge set is lazily localCheckpointed: the survivor set feeds BOTH
    the next degree aggregation and the next semi-join, and without the
    checkpoint that double consumption doubles the expression tree per
    round (2^rounds scans by round 4).

    Returns (node, deg): surviving nodes with their final in-core
    degrees (deg >= k rows only once converged).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    for _ in range(rounds):
        e = e.localCheckpoint(eager=False)
        deg = (
            e.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = e.join(
            keep.withColumnRenamed("node", "u"), "u", "left_semi"
        ).join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return deg.filter(F.col("deg") >= k).select("node", "deg")


def adamic_adar_bipartite(
    df: DataFrame,
    group_col: str,
    item_col: str,
    top: int = 100,
    max_group_size: int | None = None,
) -> DataFrame:
    """Adamic–Adar link prediction over a bipartite membership stream
    (item—group edges): score(a, b) = sum over shared groups g of
    1 / ln(|g|). The classic "people you may know" / related-item
    signal — a shared SMALL group is strong evidence, a shared huge
    group is weak, and ln damps accordingly (Adamic & Adar 2003).

    Scale shape (r11, hot-group-guarded r12): identical to
    :func:`cooccurrence_pairs` — ONE shuffle of the membership stream
    into per-group sorted distinct-item arrays (map-side
    ``collect_set``), the per-group weight 1/ln(|g|) computed on the
    group row, pairs generated IN-ARRAY via the two-level explode of
    :func:`_pair_stream` (per-row memory bounded at O(|g|)), then one
    pair aggregation. The r10 form cost three more
    exchanges of the full stream (distinct + size join + wedge
    self-join) plus two localCheckpoint materializations that existed
    only to stop Spark re-deriving the multiply-consumed stream — the
    single-consumer array form needs neither. Within-group cost is
    still sum(|g|²) pair rows (never an all-pairs product) with
    ``max_group_size`` available to drop degenerate mega-groups before
    they square. The final score is the engine-portable
    decimal sum of 6dp-rounded terms, so any partitioning yields the
    same bits. Top-N is a bounded sort.

    Output: (item_a, item_b, n_common, aa_score) for the ``top``
    highest-scoring pairs, ties broken by (item_a, item_b).
    """
    from sheetsetl_spark.operators.text import round6_bin

    grouped = (
        df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sort_array(F.collect_set(F.col(item_col))).alias("arr"))
        .select("arr", F.size("arr").alias("__gs"))
        .filter(F.col("__gs") >= 2)
    )
    if max_group_size is not None:
        grouped = grouped.filter(F.col("__gs") <= max_group_size)
    grouped = grouped.withColumn(
        "term", round6_bin(F.lit(1.0) / F.log(F.col("__gs")))
    )
    pairs = _pair_stream(grouped, carry=("term",))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum(F.col("term").cast("decimal(18,6)"))
            .cast("double")
            .alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), F.col("item_a"), F.col("item_b"))
        .limit(top)
    )
